"""Persistent-compile-cache wiring (utils/compile_cache.py)."""
import os

import jax

from dg_sct_tpu.utils import compile_cache


def test_enable_persistent_cache_sets_config(tmp_path, monkeypatch):
    monkeypatch.setenv("DG_SCT_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.setenv("DG_SCT_CACHE_FORCE", "1")  # tests run on CPU
    monkeypatch.setattr(compile_cache, "_enabled", False)
    d = compile_cache.enable_persistent_cache()
    # host-fingerprinted subdir (XLA:CPU AOT entries are machine-feature
    # pinned; see utils/compile_cache.cache_dir)
    assert d.startswith(str(tmp_path / "xla") + os.sep + "host-")
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call is a no-op returning the same dir
    assert compile_cache.enable_persistent_cache() == d
    # leave the suite's CPU runs cache-free (see skill gotcha on AOT reload)
    jax.config.update("jax_compilation_cache_dir", None)
    compile_cache._enabled = False


def test_enable_persistent_cache_noop_on_cpu(tmp_path, monkeypatch):
    monkeypatch.setenv("DG_SCT_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.delenv("DG_SCT_CACHE_FORCE", raising=False)
    monkeypatch.setattr(compile_cache, "_enabled", False)
    d = compile_cache.enable_persistent_cache()
    assert not os.path.isdir(d)  # nothing created, config untouched
    assert not compile_cache._enabled


def test_cache_dir_fallback(monkeypatch):
    monkeypatch.delenv("DG_SCT_CACHE_DIR", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", "/nonexistent-base")
    d = compile_cache.cache_dir()
    assert d.startswith("/nonexistent-base/dg_sct_tpu/xla" + os.sep + "host-")
