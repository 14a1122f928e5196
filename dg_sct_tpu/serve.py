"""Streaming inference engine — the production serving path.

The reference has no serving story (research eval loops only). This engine
packages the lessons from `bench.py` into an API:

  * fixed-shape compilation: one jitted program per (batch, chunk) shape,
    compiled once and reused for the whole stream;
  * chunked `lax.scan` execution: `chunk` steps run per dispatch, amortizing
    host->device dispatch latency (the dominant per-call cost on tunneled or
    remote-attached accelerators);
  * host pipeline overlap: a threaded decode pool (native C++ JPEG core when
    available) keeps `prefetch` chunks staged ahead of the device;
  * bf16 weights/activations on device, f32 scores back to the host.

Usage:
    eng = AVEInferenceEngine(cfg, params, state, batch_size=4, chunk=8)
    ev, is_ev, pred = eng.predict_clips(dataset)
    # ev (N, 28) clip logits; is_ev (N, T); pred (N, T) per-segment classes
    # (bg=28), exactly the driver's decision rule (train/metrics.py:13-23)
"""
from __future__ import annotations

import queue as queue_mod
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .configs import AVEModelConfig
from .models import ave
from .ops.basic import normalize_frames_u8


class AVEInferenceEngine:
    def __init__(self, cfg: AVEModelConfig, params, state, *, batch_size: int = 4,
                 chunk: int = 8, compute_dtype=jnp.bfloat16, prefetch: int = 2,
                 num_workers: int = 8, int8_towers: bool = False,
                 int8_adapters: bool = False, act_scales=None,
                 fold_eval: bool = True, stft_bf16: bool = True,
                 gelu: str = "tanh", fused_bottleneck: bool = False):
        from .utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
        if compute_dtype == jnp.bfloat16:
            # tanh-approx GELU for bf16 serving: <=3e-3 abs vs the parity
            # erf form, and the erf lowering measured -18% clips/s
            # (perf/results_r5/probe_tanh.log). Pass gelu="exact" to keep
            # the torch-parity form.
            from .ops.basic import set_gelu_mode
            set_gelu_mode(gelu)
        if stft_bf16 and compute_dtype == jnp.bfloat16 \
                and cfg.htsat.frontend.stft_compute is None:
            # serving fast path: frame x DFT-basis GEMM on the bf16 MXU with
            # f32 accumulation (<0.35 dB log-mel drift, tests/test_dsp.py)
            import dataclasses as _dc
            cfg = _dc.replace(cfg, htsat=_dc.replace(
                cfg.htsat, frontend=_dc.replace(cfg.htsat.frontend,
                                                stft_compute=jnp.bfloat16)))
        self.cfg = cfg
        self.B = batch_size
        self.chunk = chunk
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.dtype = compute_dtype

        if fold_eval:
            # eval-exact adapter folding: BN affines into the bottleneck
            # kernels, scalar gates into ln_post (tests/test_fold_eval.py)
            from .models.interleave import fold_adapters_eval
            params, state = fold_adapters_eval(params, state, cfg)
        if fused_bottleneck:
            # stage-5 bottleneck as one VMEM-resident Pallas pass (needs the
            # folded serving shape above; ops/pallas/adapter_bottleneck.py)
            from .models.adapter import set_fused_bottleneck
            set_fused_bottleneck(True)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        self.params = cast(params)
        self.state = cast(state)
        if int8_towers or int8_adapters:
            # static weights on the v5e int8 MXU path (ops/quant.py); in
            # serving the adapters are static too, so `int8_adapters` extends
            # coverage to their fat affines. `act_scales` (from
            # quant.calibrate_ave) enables the fast static-activation-scale
            # mode.
            from .ops.quant import quantize_eval_params
            towers = (("swin", "htsat", "adapters") if int8_adapters
                      else ("swin", "htsat"))
            self.params = quantize_eval_params(self.params, towers=towers,
                                               act_scales=act_scales)

        def dequant_wave(w):
            # wire-format dispatch (static at trace time): i16 PCM and
            # mu-law u8 dequantize on-device; float passes through
            if w.dtype == jnp.int16:
                return w.astype(compute_dtype) * jnp.asarray(
                    1.0 / 32767.0, compute_dtype)
            if w.dtype == jnp.uint8:
                from .ops.basic import dequantize_mulaw_u8
                return dequantize_mulaw_u8(w, dtype=compute_dtype)
            return w.astype(compute_dtype)

        def stream_fn(params, state, waves, imgs):
            def body(carry, wi):
                w, im = wi
                if im.dtype == jnp.uint8:  # serving ingest: uint8 frames,
                    im = normalize_frames_u8(im, compute_dtype)  # on-device norm
                out, _ = ave.forward(params, state, dequant_wave(w), im, cfg,
                                     train=False)
                return carry, {k: out[k].astype(jnp.float32)
                               for k in ("event_scores", "is_event_scores")}

            _, outs = jax.lax.scan(body, 0, (waves, imgs))
            return outs

        def stream_fn_yuv(params, state, waves, ys, uvs):
            from .ops.basic import normalize_frames_yuv420

            def body(carry, wyu):
                w, y, uv = wyu
                im = normalize_frames_yuv420(y, uv, dtype=compute_dtype)
                out, _ = ave.forward(params, state, dequant_wave(w), im, cfg,
                                     train=False)
                return carry, {k: out[k].astype(jnp.float32)
                               for k in ("event_scores", "is_event_scores")}

            _, outs = jax.lax.scan(body, 0, (waves, ys, uvs))
            return outs

        self._fn = jax.jit(stream_fn)
        self._fn_yuv = jax.jit(stream_fn_yuv)

    def _chunk_batches(self, dataset) -> Iterator[Tuple[tuple, list]]:
        """Group the dataset into (chunk, B, ...) stacked input blocks; the
        final ragged block is padded up to full shape (pad rows dropped from
        the yielded ids). Yields ((wave, image) or (wave, image_y, image_uv),
        ids) depending on the dataset's frame format."""
        from .data.ave import batched_iterator

        acc: dict = {}
        ids = []
        img_keys = None
        for bi, batch in enumerate(batched_iterator(
                dataset, self.B, shuffle=False, drop_last=False,
                num_workers=self.num_workers, prefetch=self.prefetch * self.chunk)):
            if img_keys is None:  # dataset format: RGB or planar YUV420
                img_keys = ("image_y", "image_uv") if "image_y" in batch \
                    else ("image",)
            n = batch["wave"].shape[0]
            if n < self.B:  # pad the final partial batch
                reps = self.B - n
                batch = {k: (np.concatenate([v] + [v[-1:]] * reps)
                             if isinstance(v, np.ndarray) else v)
                         for k, v in batch.items()}
            for k in ("wave",) + img_keys:
                acc.setdefault(k, []).append(batch[k])
            ids.append([(bi * self.B + j) for j in range(n)])
            if len(acc["wave"]) == self.chunk:
                yield tuple(np.stack(acc[k]) for k in ("wave",) + img_keys), ids
                acc, ids = {}, []
        if acc:
            while len(acc["wave"]) < self.chunk:  # pad the final partial chunk
                for k in acc:
                    acc[k].append(acc[k][-1])
                ids.append([])
            yield tuple(np.stack(acc[k]) for k in ("wave",) + img_keys), ids

    def stream(self, dataset) -> Iterator[Tuple[dict, list]]:
        """Yield ({event_scores (chunk, B*T, n_cls+1), is_event_scores ...},
        ids) per chunk, with the NEXT chunk's decode and upload overlapping the
        current chunk's device execution (1-deep software pipeline)."""
        from .data.ave import device_prefetch

        pending: Optional[tuple] = None
        # device_prefetch stages chunk k+1's host->device copy while chunk k
        # executes (through the tunnel the copy otherwise serializes with
        # compute; see bench.py bench_e2e's ingest measurement). Wire-format
        # conversions (i16/mu-law wave, u8/YUV420 frames) all run ON DEVICE
        # inside the jitted stream (static dtype dispatch).
        chunks = ({"arrs": arrs, "ids": ids}
                  for arrs, ids in self._chunk_batches(dataset))
        for ch in device_prefetch(chunks, size=2, keys=("arrs",)):
            arrs = ch["arrs"]
            if arrs[0].dtype not in (jnp.int16, jnp.uint8):
                arrs = (arrs[0].astype(self.dtype),) + tuple(arrs[1:])
            if len(arrs) == 3:  # (wave, image_y, image_uv)
                fut = self._fn_yuv(self.params, self.state, *arrs)
            else:
                im = arrs[1]
                if im.dtype != jnp.uint8:
                    im = im.astype(self.dtype)
                fut = self._fn(self.params, self.state, arrs[0], im)
            ids = ch["ids"]
            if pending is not None:
                yield self._finish(pending)
            pending = (fut, ids)
        if pending is not None:
            yield self._finish(pending)

    @staticmethod
    def _finish(pending):
        fut, ids = pending
        out = {k: np.asarray(v) for k, v in fut.items()}
        return out, ids

    def predict_clips(self, dataset):
        """Run the whole dataset; returns (event_scores (N, n_cls),
        is_event_scores (N, T), segment_preds (N, T)) in dataset order,
        padding removed. Segment rule = the AVE driver's
        (`train/metrics.py:13-23`): background unless sigmoid(is_event)>0.5,
        else the clip-level argmax class."""
        ev_all, is_all = [], []
        for out, ids in self.stream(dataset):
            ev = out["event_scores"]        # (chunk, B, n_cls)
            ie = out["is_event_scores"]     # (chunk, B, T)
            for ci, id_row in enumerate(ids):
                k = len(id_row)
                if k:
                    ev_all.append(ev[ci, :k])
                    is_all.append(ie[ci, :k])
        ev = np.concatenate(ev_all)
        ie = np.concatenate(is_all)
        n_cls = ev.shape[-1]
        pos = 1.0 / (1.0 + np.exp(-ie)) > 0.5
        pred = np.where(pos, ev.argmax(-1)[:, None], n_cls)
        return ev, ie, pred


class _StreamingEngineBase:
    """Shared streaming plumbing for the task-family engines: fixed-shape
    chunked `lax.scan` dispatch, threaded decode pool (`batched_iterator`),
    double-buffered host->device staging (`device_prefetch`), ragged-tail
    padding with meta-aligned unpadding."""

    def _setup(self, cfg, *, batch_size, chunk, compute_dtype, prefetch,
               num_workers, gelu):
        from .utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
        if compute_dtype == jnp.bfloat16:
            from .ops.basic import set_gelu_mode
            set_gelu_mode(gelu)
        self.cfg = cfg
        self.B = batch_size
        self.chunk = chunk
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.dtype = compute_dtype

    def _cast_tree(self, t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    def _stream(self, dataset, arr_keys, meta_fn):
        """Yield (device-future outputs, metas) per chunk: stacks `arr_keys`
        into (chunk, B, ...) blocks, `meta_fn(batch, n)` collects the
        host-side row metadata, `self._fn` is the jitted chunk program."""
        from .data.ave import batched_iterator, device_prefetch

        def chunks():
            acc, metas = [], []
            for batch in batched_iterator(
                    dataset, self.B, shuffle=False, drop_last=False,
                    num_workers=self.num_workers,
                    prefetch=self.prefetch * self.chunk):
                n = batch[arr_keys[0]].shape[0]
                if n < self.B:
                    reps = self.B - n
                    batch = {k: (np.concatenate([v] + [v[-1:]] * reps)
                                 if isinstance(v, np.ndarray) else v)
                             for k, v in batch.items()}
                acc.append(tuple(batch[k] for k in arr_keys))
                metas.append(meta_fn(batch, n))
                if len(acc) == self.chunk:
                    yield {"arrs": tuple(np.stack(z) for z in zip(*acc)),
                           "metas": metas}
                    acc, metas = [], []
            if acc:
                while len(acc) < self.chunk:
                    acc.append(acc[-1])
                    metas.append([])
                yield {"arrs": tuple(np.stack(z) for z in zip(*acc)),
                       "metas": metas}

        pending = None
        for ch in device_prefetch(chunks(), size=2, keys=("arrs",)):
            fut = self._fn(self.params, self.state, *ch["arrs"])
            if pending is not None:
                yield pending
            pending = (fut, ch["metas"])
        if pending is not None:
            yield pending


class AVVPInferenceEngine(_StreamingEngineBase):
    """Streaming audio-visual video parsing (LLP): yields the probability
    set the AVVP evaluator consumes (`train/avvp_eval.py`) — global / audio /
    visual clip probs and the (T, 25) per-segment frame probs — per video.

    Usage:
        eng = AVVPInferenceEngine(cfg, params, state)
        for probs, vids in eng.stream_probs(dataset):
            # probs: dict of (n, ...) arrays; vids: aligned video ids
    """

    def __init__(self, cfg, params, state, *, batch_size: int = 4,
                 chunk: int = 4, compute_dtype=jnp.bfloat16,
                 prefetch: int = 2, num_workers: int = 8,
                 int8_towers: bool = False, act_scales=None,
                 fold_eval: bool = True, gelu: str = "tanh"):
        from .models import avvp as avvp_model
        self._setup(cfg, batch_size=batch_size, chunk=chunk,
                    compute_dtype=compute_dtype, prefetch=prefetch,
                    num_workers=num_workers, gelu=gelu)
        if fold_eval:
            from .models.interleave import fold_adapters_eval
            params, state = fold_adapters_eval(params, state, cfg)
        self.params = self._cast_tree(params)
        self.state = self._cast_tree(state)
        if int8_towers:  # act_scales: quant.calibrate_avvp
            from .ops.quant import quantize_eval_params
            self.params = quantize_eval_params(self.params,
                                               towers=("swin", "htsat"),
                                               act_scales=act_scales)
        dtype = compute_dtype

        def stream_fn(params, state, waves, imgs, sts):
            def body(carry, wis):
                w, im, st = wis
                out, _ = avvp_model.forward(params, state, w.astype(dtype),
                                            im.astype(dtype),
                                            st.astype(dtype), cfg,
                                            train=False)
                keep = ("global_prob", "a_prob", "v_prob",
                        "a_frame_prob", "v_frame_prob")
                return carry, {k: out[k].astype(jnp.float32) for k in keep}

            _, outs = jax.lax.scan(body, 0, (waves, imgs, sts))
            return outs

        self._fn = jax.jit(stream_fn)

    def stream_probs(self, dataset) -> Iterator[Tuple[dict, list]]:
        for fut, metas in self._stream(
                dataset, ("wave", "image", "video_st"),
                lambda b, n: list(b["video"][:n])):
            out = {k: np.asarray(v) for k, v in fut.items()}
            vids, keep = [], []
            for ci, row in enumerate(metas):
                for j in range(len(row)):
                    keep.append((ci, j))
                vids.extend(row)
            sel = {k: np.stack([v[ci, j] for ci, j in keep]) if keep
                   else v[:0, 0] for k, v in out.items()}
            yield sel, vids


class AVQAInferenceEngine(_StreamingEngineBase):
    """Streaming audio-visual question answering: yields (B, 42) answer
    logits + argmax answer indices per question.  The matching (nega)
    branch is training-only, so the engine feeds the positive frames to
    both streams — XLA CSEs the identical tower pass, making the dead
    branch free.

    Usage:
        eng = AVQAInferenceEngine(cfg, params, state)
        for logits, preds, metas in eng.stream_answers(dataset):
            # metas: [(answer_idx, question_type)] aligned rows
    """

    def __init__(self, cfg, params, state, *, batch_size: int = 4,
                 chunk: int = 4, compute_dtype=jnp.bfloat16,
                 prefetch: int = 2, num_workers: int = 8,
                 int8_towers: bool = False, act_scales=None,
                 fold_eval: bool = True, gelu: str = "tanh"):
        from .models import avqa as avqa_model
        self._setup(cfg, batch_size=batch_size, chunk=chunk,
                    compute_dtype=compute_dtype, prefetch=prefetch,
                    num_workers=num_workers, gelu=gelu)
        if fold_eval:
            from .models.interleave import fold_adapters_eval
            params, state = fold_adapters_eval(params, state, cfg)
        self.params = self._cast_tree(params)
        self.state = self._cast_tree(state)
        if int8_towers:  # act_scales: quant.calibrate_avqa
            from .ops.quant import quantize_eval_params
            self.params = quantize_eval_params(self.params,
                                               towers=("swin", "htsat"),
                                               act_scales=act_scales)
        dtype = compute_dtype

        def stream_fn(params, state, waves, imgs, questions):
            def body(carry, wiq):
                w, im, q = wiq
                im = im.astype(dtype)
                out, _ = avqa_model.forward(params, state, w.astype(dtype),
                                            im, im, q, cfg, train=False)
                return carry, out["out_qa"].astype(jnp.float32)

            _, outs = jax.lax.scan(body, 0, (waves, imgs, questions))
            return outs

        self._fn = jax.jit(stream_fn)

    def stream_answers(self, dataset):
        for fut, metas in self._stream(
                dataset, ("wave", "visual_posi", "question"),
                lambda b, n: list(zip(b["answer"][:n].tolist(),
                                      b["type"][:n]))):
            arr = np.asarray(fut)                     # (chunk, B, n_ans)
            logits, out_meta = [], []
            for ci, row in enumerate(metas):
                k = len(row)
                if k:
                    logits.append(arr[ci, :k])
                    out_meta.extend(row)
            logits = (np.concatenate(logits) if logits else arr[:0, 0])
            yield logits, logits.argmax(-1), out_meta


class AVSInferenceEngine(_StreamingEngineBase):
    """Streaming mask inference for AVS S4/MS3 — the second task family on
    the same serving machinery (fixed-shape chunked `lax.scan` dispatch,
    threaded decode pool, double-buffered device staging).  The reference
    ships only a research eval loop (`avs_s4/test.py`); this packages the
    mask decoder as a production API.

    Mask transport: with `mask_u8=True` (default) the device ships sigmoid
    probabilities quantized to uint8 — a 4x cut of the dominant
    device->host bytes (the (chunk, B, T, H, W) mask stack), <=1/255
    absolute error; `mask_u8=False` returns raw f32 logits.

    Usage:
        eng = AVSInferenceEngine(cfg, params, state, batch_size=2, chunk=4)
        for masks, metas in eng.stream_masks(dataset):
            # masks (n, T, H, W) float probs in [0,1]; metas aligned
            # (category, video) pairs from the dataset
    """

    def __init__(self, cfg, params, state, *, batch_size: int = 2,
                 chunk: int = 4, compute_dtype=jnp.bfloat16,
                 prefetch: int = 2, num_workers: int = 8,
                 int8_towers: bool = False, act_scales=None,
                 fold_eval: bool = True,
                 gelu: str = "tanh", mask_u8: bool = True):
        from .models import avs as avs_model
        self._setup(cfg, batch_size=batch_size, chunk=chunk,
                    compute_dtype=compute_dtype, prefetch=prefetch,
                    num_workers=num_workers, gelu=gelu)
        self.mask_u8 = mask_u8

        if fold_eval:
            # near-no-op for the AVS adapter variant (no BN; gate precedes
            # ln_post so it stays live) but keeps the entry points uniform
            from .models.interleave import fold_adapters_eval
            params, state = fold_adapters_eval(params, state, cfg)
        self.params = self._cast_tree(params)
        self.state = self._cast_tree(state)
        if int8_towers:
            # act_scales from quant.calibrate_avs enables the fast static
            # activation-scale mode; without them, dynamic per-row scales
            # (functional, measured neutral vs bf16 on AVE in r3)
            from .ops.quant import quantize_eval_params
            self.params = quantize_eval_params(self.params,
                                               towers=("swin", "htsat"),
                                               act_scales=act_scales)

        def stream_fn(params, state, waves, imgs):
            def body(carry, wi):
                w, im = wi
                out, _ = avs_model.forward(params, state,
                                           im.astype(compute_dtype),
                                           w.astype(compute_dtype), cfg,
                                           train=False)
                pred = out["pred"]                    # (B*T, H, W, 1) logits
                if self.mask_u8:
                    prob = jax.nn.sigmoid(pred.astype(jnp.float32))
                    pred = jnp.round(prob * 255.0).astype(jnp.uint8)
                else:
                    pred = pred.astype(jnp.float32)
                return carry, pred[..., 0]

            _, outs = jax.lax.scan(body, 0, (waves, imgs))
            return outs

        self._fn = jax.jit(stream_fn)

    def stream_masks(self, dataset) -> Iterator[Tuple[np.ndarray, list]]:
        """Yield (masks (n, T, H, W) float probs — or logits when
        mask_u8=False — , metas [(category, video)]) per chunk in dataset
        order; the ragged tail is unpadded."""
        for pending in self._stream(
                dataset, ("wave", "image"),
                lambda b, n: list(zip(b["category"], b["video"]))[:n]):
            yield self._finish(pending)

    def _finish(self, pending):
        fut, metas = pending
        T = self.cfg.num_frames
        arr = np.asarray(fut)                       # (chunk, B*T, H, W)
        chunk, BT, H, W = arr.shape
        arr = arr.reshape(chunk, BT // T, T, H, W)
        if self.mask_u8:
            arr = arr.astype(np.float32) / 255.0
        masks, out_meta = [], []
        for ci, meta_row in enumerate(metas):
            k = len(meta_row)
            if k:
                masks.append(arr[ci, :k])
                out_meta.extend(meta_row)
        return (np.concatenate(masks) if masks
                else arr[:0, 0]), out_meta
