"""ctypes bindings for the native persistent-homology/union-find extension."""

from __future__ import annotations

import ctypes

import numpy as np

from unet_torch_tpu.native.build import build_shared

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_shared("ph0"))
        lib.superlevel_ph0.restype = ctypes.c_int
        lib.superlevel_ph0.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.count_components.restype = ctypes.c_int
        lib.count_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def superlevel_ph0(img: np.ndarray, max_bars: int):
    """Drop-in for losses.topo._superlevel_ph0_np (same contract)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    births = np.zeros(max_bars, np.int32)
    deaths = np.zeros(max_bars, np.int32)
    n = lib.superlevel_ph0(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, max_bars,
        births.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        deaths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return births, deaths, np.int32(n)


def count_components(mask: np.ndarray) -> int:
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    return int(lib.count_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w))
