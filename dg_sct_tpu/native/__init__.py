"""ctypes bindings for the native IO core (`io_core.cpp`).

Compiled on demand with g++ (cached next to the source). Falls back cleanly —
callers should check `available()` and use the PIL path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_core.cpp")
_LIB = os.path.join(_DIR, "libdgsct_io.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    base = ["g++", "-O3", "-fno-math-errno", "-shared", "-fPIC", "-fopenmp",
            _SRC, "-ljpeg", "-o", _LIB]
    # AVX2+FMA first (the resize hot loops are written to auto-vectorize);
    # fall back to baseline codegen if the toolchain/host rejects it.
    for extra in (["-march=x86-64-v3"], []):
        try:
            subprocess.run(base[:2] + extra + base[2:], check=True,
                           capture_output=True)
            return True
        except subprocess.CalledProcessError:
            continue
        except FileNotFoundError:
            return False
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.dgsct_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.dgsct_decode_jpeg.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.dgsct_load_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.dgsct_decode_jpeg_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.dgsct_load_jpeg_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.dgsct_decode_jpeg_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    lib.dgsct_load_jpeg_batch_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_normalize(img: np.ndarray, out_size: int, mean, std) -> np.ndarray:
    """(H, W, 3) uint8 -> (out, out, 3) float32 antialiased-bicubic resized
    and ImageNet-normalized (PIL-compatible)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    dst = np.empty((out_size, out_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.dgsct_resize_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], _fptr(dst), out_size, _fptr(mean), _fptr(std))
    if rc != 0:
        raise RuntimeError("native resize failed")
    return dst


def load_jpeg_batch_u8(paths: Sequence[str], out_size: int) -> np.ndarray:
    """Fast serving path: parallel DCT-scaled decode + antialiased resize ->
    (n, out, out, 3) uint8. The JPEG is decoded at the smallest m/8 scale that
    still covers `out_size` (IDCT cost drops ~quadratically), and
    normalization is left to the device (`ops.basic.normalize_frames_u8`) —
    together this cuts single-core host cost per frame by ~2-3x vs the float
    path and quarters the host->device bytes."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    dst = np.empty((n, out_size, out_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.dgsct_load_jpeg_batch_u8(
        arr, n, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_size)
    if rc != 0:
        raise RuntimeError("native jpeg u8 batch load failed")
    return dst


def load_jpeg_batch_yuv420(paths: Sequence[str], out_size: int):
    """Half-payload serving ingest: parallel DCT-scaled decode to YCbCr
    (libjpeg skips its color-conversion pass), antialiased resize, plane
    split -> y (n, out, out) u8 + uv (n, out/2, out/2, 2) u8 — 1.5 bytes/px
    vs 3 for interleaved RGB, with the chroma upsample + YCbCr->RGB affine +
    ImageNet normalize all fused on-device
    (`ops.basic.normalize_frames_yuv420`)."""
    lib = _load()
    assert lib is not None and out_size % 2 == 0
    n = len(paths)
    y = np.empty((n, out_size, out_size), np.uint8)
    uv = np.empty((n, out_size // 2, out_size // 2, 2), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.dgsct_load_jpeg_batch_yuv420(
        arr, n, y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_size)
    if rc != 0:
        raise RuntimeError("native jpeg yuv420 batch load failed")
    return y, uv


def load_jpeg_batch(paths: Sequence[str], out_size: int, mean, std) -> np.ndarray:
    """Parallel decode+resize+normalize -> (n, out, out, 3) float32."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    dst = np.empty((n, out_size, out_size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.dgsct_load_jpeg_batch(arr, n, _fptr(dst), out_size,
                                   _fptr(mean), _fptr(std))
    if rc != 0:
        raise RuntimeError("native jpeg batch load failed")
    return dst
