"""Persistent XLA compilation cache for every framework entry point.

Cold-compiling the full AVE forward through the axon tunnel costs minutes
(measured in perf/compile_floor.py / NOTES.md); the reference never pays
this because eager torch has no compile step.  We amortize it instead:
every driver, the serving engine, and the bench call
:func:`enable_persistent_cache` before their first `jit`, so any program
previously compiled *on this machine* (same JAX version + HLO + flags)
loads from disk in seconds.

The cache directory resolves, in order:
  1. ``$DG_SCT_CACHE_DIR``
  2. ``$XDG_CACHE_HOME/dg_sct_tpu/xla``
  3. ``~/.cache/dg_sct_tpu/xla``

A stable per-user location (NOT a fresh tempdir) is the point — the
round-2 bench used /tmp, which a reboot or machine swap silently wipes.
"""
from __future__ import annotations

import os

_enabled = False


def cache_dir() -> str:
    d = os.environ.get("DG_SCT_CACHE_DIR")
    if not d:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        d = os.path.join(base, "dg_sct_tpu", "xla")
    # Host-fingerprinted subdir: a process using the TPU backend still
    # compiles its host-side (CPU) programs into the same cache dir, and
    # XLA:CPU AOT entries are machine-feature pinned — round-5's bench log
    # caught entries written on an AMX-capable host loading here with
    # "could lead to execution errors such as SIGILL" (cpu_aot_loader).
    # Keying by host features means a machine hop costs a cold compile
    # instead of risking miscompute.
    return os.path.join(d, "host-" + _cpu_fingerprint())


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at a stable directory.

    Idempotent; safe to call from every entry point.  Returns the dir.
    No-op on CPU-only backends (XLA:CPU AOT artifacts are machine-feature
    pinned — reloading on a different host spews SIGILL-risk warnings);
    ``DG_SCT_CACHE_FORCE=1`` overrides.
    """
    global _enabled
    import jax

    d = cache_dir()
    if _enabled:
        return d
    if (jax.default_backend() == "cpu"
            and os.environ.get("DG_SCT_CACHE_FORCE") != "1"):
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    _enabled = True
    return d


def _cpu_fingerprint() -> str:
    """Hash of the host's CPU feature flags + toolchain versions.

    XLA:CPU AOT artifacts are machine-feature pinned; keying the cache dir by
    this fingerprint makes CPU caching safe — a different host simply sees an
    empty dir instead of loading SIGILL-risk entries.
    """
    import hashlib
    import platform
    import sys

    bits = [platform.machine(), sys.version.split()[0]]
    try:
        import jax
        bits.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:16]


def enable_cpu_cache(min_compile_secs: float = 1.0) -> str:
    """Persistent compile cache for XLA:CPU-only processes (dryrun_multichip:
    on the 1-core hosts this fleet runs on, the virtual-8-device train-step
    compiles dominate the dryrun wall-clock — MULTICHIP_r04 died at rc=124 on
    exactly these; a same-host rerun loads them from disk in seconds).
    `cache_dir()` is host-fingerprinted, so this is safe cross-machine."""
    global _enabled
    import jax

    d = cache_dir()
    if _enabled:
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    _enabled = True
    return d
