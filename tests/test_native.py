"""Native C++ PH0 extension vs the numpy implementation."""

import numpy as np
import pytest

from unet_torch_tpu.losses.topo import _superlevel_ph0_np


@pytest.fixture(scope="module")
def native():
    from unet_torch_tpu.native import ph0

    ph0._load()  # compiles on first use
    return ph0


def test_native_ph0_matches_numpy(native):
    rng = np.random.RandomState(0)
    img = rng.rand(24, 24).astype(np.float32)
    b_np, d_np, n_np = _superlevel_ph0_np(img, 16)
    b_cc, d_cc, n_cc = native.superlevel_ph0(img, 16)
    assert n_np == n_cc
    flat = img.ravel()
    # persistence spectra identical (indices may differ on exact ties)
    np.testing.assert_allclose(
        np.sort(flat[b_np[:n_np]] - flat[d_np[:n_np]])[::-1],
        np.sort(flat[b_cc[:n_cc]] - flat[d_cc[:n_cc]])[::-1], atol=1e-6)


def test_native_ph0_blobs(native):
    yy, xx = np.mgrid[:32, :32]
    img = np.zeros((32, 32), np.float32)
    for cy, cx in [(8, 8), (24, 24), (8, 24)]:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
    img = np.clip(img, 0, 1)
    b, d, n = native.superlevel_ph0(img, 16)
    pers = img.ravel()[b[:n]] - img.ravel()[d[:n]]
    assert np.sum(pers > 0.5) == 3


def test_native_count_components(native):
    mask = np.zeros((16, 16), np.uint8)
    mask[2:5, 2:5] = 1
    mask[10:12, 10:12] = 1
    mask[0, 15] = 1
    assert native.count_components(mask) == 3


def test_native_speedup(native):
    import time

    rng = np.random.RandomState(1)
    img = rng.rand(96, 96).astype(np.float32)
    t0 = time.perf_counter()
    native.superlevel_ph0(img, 64)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _superlevel_ph0_np(img, 64)
    t_np = time.perf_counter() - t0
    assert t_native < t_np  # C++ must beat the Python loop
