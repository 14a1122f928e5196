"""GPipe-style pipeline parallelism over a stack of uniform stages.

The reference has no pipelining (its parallelism story is single-GPU
`nn.DataParallel`, SURVEY.md §2.8); this is the TPU-native scale-out path for
deep interleaved encoders: place contiguous chunks of the repeated
pair-of-group blocks (the model's stage 2 — 18 visual / 6 audio blocks, the
bulk of the FLOPs) on successive devices of a `pipe` mesh axis and stream
microbatches through the ring with `lax.ppermute`, exactly the
schedule-as-a-scan formulation XLA pipelines well (no host round-trips, one
collective per tick riding ICI).

Design notes:
  * stages must be *uniform* (same pytree structure/shapes) — true for the
    stage-2 paired blocks, which is also what `interleave._detect_scan_pairs`
    already certifies for the lax.scan path; the stacked-params layout is
    shared between the two features.
  * `n_stages` must be a multiple of the pipe-axis size; each device applies
    `n_stages / P` stages back-to-back per tick (deeper chunks amortize the
    bubble).
  * the bubble is the standard GPipe (P-1)/(M+P-1) factor; throughput needs
    M >> P microbatches.
  * outputs are emitted by the last stage and made replicated with a masked
    `psum` — on hardware this is one small collective per tick on ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_stages(stage_params_list):
    """Stack a list of identically-structured per-stage param pytrees along a
    new leading axis (the layout `gpipe` shards over the pipe axis)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_params_list)


def gpipe(body, stacked_params, microbatches, mesh: Mesh, *,
          axis: str = PIPE_AXIS, check_numerics: bool = False):
    """Run `y_m = stages[n-1](...stages[0](x_m))` for every microbatch m,
    pipelined over the mesh's `axis`.

    body(stage_params, x) -> x         one stage; x is an arbitrary pytree
                                       of arrays (all leaves microbatched).
    stacked_params                     pytree with leading axis n_stages
                                       (see `stack_stages`).
    microbatches                       pytree with leading axis n_micro; each
                                       x_m = tree_map(lambda a: a[m], ...).

    Returns the outputs stacked along the same leading n_micro axis,
    bit-identical to the sequential loop (tests/test_pipeline.py).
    """
    n_stages = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    n_micro = jax.tree_util.tree_leaves(microbatches)[0].shape[0]
    p = mesh.shape[axis]
    if n_stages % p != 0:
        raise ValueError(f"n_stages={n_stages} not divisible by pipe={p}")
    per_dev = n_stages // p
    total = n_micro + p - 1  # ramp-up bubble

    # pad the microbatch stream with zeros for the drain ticks
    pad = jax.tree_util.tree_map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((p - 1,) + a.shape[1:], a.dtype)]), microbatches)

    def shard_fn(local_params, mbs):
        # local_params leading axis = per_dev stages owned by this device
        sid = jax.lax.axis_index(axis)
        x0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), mbs)

        def apply_chunk(x):
            def step(c, p1):
                return body(p1, c), None
            x, _ = jax.lax.scan(step, x, local_params)
            return x

        fwd = [(i, i + 1) for i in range(p - 1)]  # stage i -> i+1 (no wrap)

        def tick(state, x_t):
            prev = jax.lax.ppermute(state, axis, fwd)
            inp = jax.tree_util.tree_map(
                lambda a, b: jnp.where(sid == 0, a, b), x_t, prev)
            new = apply_chunk(inp)
            out = jax.tree_util.tree_map(
                lambda a: jnp.where(sid == p - 1, a, jnp.zeros_like(a)), new)
            return new, out

        _, outs = jax.lax.scan(tick, x0, mbs)
        # emitted only by the last stage; psum -> replicated everywhere
        return jax.lax.psum(outs, axis)

    in_specs = (P(axis), P())
    out_specs = P()
    if hasattr(jax, "shard_map"):
        fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
    else:
        from jax.experimental.shard_map import shard_map as _sm
        fn = _sm(shard_fn, mesh=mesh, in_specs=in_specs,
                 out_specs=out_specs, check_rep=False)
    outs = fn(stacked_params, pad)
    # microbatch m exits at tick m + (p - 1)
    return jax.tree_util.tree_map(lambda a: a[p - 1:], outs)
