// Phase-level timing of the native decode path (perf companion to
// perf/decode_scaling.py): DCT-scaled JPEG decode vs bicubic resize vs
// normalize, over a JPEG file given on argv. Compile:
//   g++ -O3 -march=native -fno-math-errno decode_phases.cpp -ljpeg -o /tmp/dp
// Usage: /tmp/dp <jpeg> <out_size> <iters>
#define DGSCT_IO_NO_EXTERN_MAIN
#include "../dg_sct_tpu/native/io_core.cpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>

static double now_ms() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <jpeg> <out> <iters>\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  const int out = std::atoi(argv[2]);
  const int iters = std::atoi(argv[3]);

  FILE* f = std::fopen(path, "rb");
  if (!f) return 2;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != (size_t)len) return 2;
  std::fclose(f);

  std::vector<uint8_t> rgb;
  int h = 0, w = 0;

  // full decode
  double t0 = now_ms();
  for (int i = 0; i < iters; ++i)
    decode_jpeg(buf.data(), buf.size(), &rgb, &h, &w, 0);
  double full_ms = (now_ms() - t0) / iters;
  std::printf("full_decode %dx%d: %.3f ms\n", h, w, full_ms);

  // DCT-scaled decode
  t0 = now_ms();
  for (int i = 0; i < iters; ++i)
    decode_jpeg(buf.data(), buf.size(), &rgb, &h, &w, out);
  double dct_ms = (now_ms() - t0) / iters;
  std::printf("dct_decode  %dx%d: %.3f ms\n", h, w, dct_ms);

  // resize u8 (from the DCT-scaled size)
  std::vector<uint8_t> du8((size_t)out * out * 3);
  t0 = now_ms();
  for (int i = 0; i < iters; ++i)
    resize_bicubic_u8(rgb.data(), h, w, du8.data(), out);
  double rs_ms = (now_ms() - t0) / iters;
  std::printf("resize_u8   ->%d: %.3f ms\n", out, rs_ms);

  // float resize+normalize (training-parity path, from FULL-size decode)
  decode_jpeg(buf.data(), buf.size(), &rgb, &h, &w, 0);
  std::vector<float> df((size_t)out * out * 3);
  const float mean[3] = {0.485f, 0.456f, 0.406f};
  const float stdv[3] = {0.229f, 0.224f, 0.225f};
  t0 = now_ms();
  for (int i = 0; i < iters; ++i)
    dgsct_resize_normalize(rgb.data(), h, w, df.data(), out, mean, stdv);
  double rn_ms = (now_ms() - t0) / iters;
  std::printf("resize_norm(full %dx%d)->%d: %.3f ms\n", h, w, out, rn_ms);

  std::printf("u8_path_total: %.3f ms/frame  float_path_total: %.3f ms/frame\n",
              dct_ms + rs_ms, full_ms + rn_ms);
  return 0;
}
