"""Data pipeline units: stain transforms, peak detection, augmentation,
discovery, loaders, datasets."""

import os

import numpy as np
import pytest

from unet_torch_tpu.data.io import (
    get_image_list,
    natural_sort,
    z_normalize,
    zoom_resize,
)
from unet_torch_tpu.data.stain import MacenkoNormalizer, rgb2hed
from unet_torch_tpu.data.synthetic import write_synthetic_dataset
from unet_torch_tpu.eval.peaks import peak_local_max


def test_natural_sort():
    assert natural_sort(["img10.png", "img2.png", "img1.png"]) == \
        ["img1.png", "img2.png", "img10.png"]


def test_get_image_list_excludes_labels(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_images=2, size=16)
    files = get_image_list(str(tmp_path))
    assert len(files) == 2
    assert all("_label" not in f and "_gt_dot" not in f for f in files)


def test_z_normalize_per_channel():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3) * 255
    z = z_normalize(img)
    # f32 output (model-input dtype); stats accumulate in f64 via cv2
    np.testing.assert_allclose(z.mean(axis=(0, 1)), 0, atol=1e-6)
    np.testing.assert_allclose(z.std(axis=(0, 1)), 1, atol=1e-6)


def test_zoom_resize_orders():
    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    up = zoom_resize(img, 16, 16, order=3)
    assert up.shape == (16, 16)
    lbl = zoom_resize(img.astype(np.int32), 16, 16, order=0)
    assert set(np.unique(lbl)) <= set(np.unique(img))  # nearest keeps values


def test_rgb2hed_separates_hematoxylin():
    # pure hematoxylin-coloured pixels have high H channel, low E
    h_rgb = np.full((4, 4, 3), (106, 80, 180), np.uint8)  # bluish-purple
    e_rgb = np.full((4, 4, 3), (230, 120, 160), np.uint8)  # pink
    hed_h = rgb2hed(h_rgb)
    hed_e = rgb2hed(e_rgb)
    assert hed_h[..., 0].mean() > hed_e[..., 0].mean()


def test_macenko_normalizer_identity_like():
    rng = np.random.RandomState(0)
    # synthetic two-stain image
    yy, xx = np.mgrid[:64, :64]
    h_conc = (np.sin(yy / 9.0) + 1) * 0.6
    e_conc = (np.cos(xx / 7.0) + 1) * 0.4
    stains = np.array([[0.65, 0.70, 0.29], [0.07, 0.99, 0.11]])
    od = np.stack([h_conc, e_conc], -1).reshape(-1, 2) @ stains
    img = np.clip(255 * np.exp(-od), 0, 255).reshape(64, 64, 3).astype(
        np.uint8)
    norm = MacenkoNormalizer().fit(img)
    out = norm.transform(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # normalising an image to its own stain basis should roughly preserve it
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 25


def test_peak_local_max_finds_peaks():
    img = np.zeros((32, 32))
    img[8, 8] = 1.0
    img[20, 25] = 0.8
    img[9, 9] = 0.5  # within min_distance of the first peak -> suppressed
    coords = peak_local_max(img, min_distance=3)
    assert len(coords) == 2
    assert [8, 8] in coords.tolist() and [20, 25] in coords.tolist()


def test_basic_geometric_keeps_alignment():
    from unet_torch_tpu.data.augment import basic_geometric

    rng = np.random.RandomState(1)
    img = np.zeros((16, 16), np.float32)
    img[4, 7] = 1
    mask = np.zeros((16, 16), np.float32)
    mask[4, 7] = 1
    for _ in range(10):
        a, b = basic_geometric([img, mask], rng)
        # geometric transforms apply identically to both
        np.testing.assert_array_equal(a > 0.5, b > 0.5)


def test_pathology_augment_hm_joint():
    from unet_torch_tpu.data.augment import pathology_augment_hm

    rng = np.random.RandomState(2)
    img = np.full((64, 64, 3), 200, np.uint8)
    hm1 = np.zeros((64, 64), np.float32)
    hm1[30, 30] = 1
    hm2 = hm1.copy()
    out_img, (o1, o2) = pathology_augment_hm(img, [hm1, hm2], rng)
    assert out_img.shape[2] == 3
    np.testing.assert_array_equal(o1, o2)  # heatmaps transformed identically


def test_data_reg_mt_contract(tmp_path):
    from unet_torch_tpu.data.datasets import DataRegMT

    write_synthetic_dataset(str(tmp_path), n_images=2, size=32)
    ds = DataRegMT([str(tmp_path)], ch=3, augmentation=False,
                   input_size=(32, 32))
    img, (immune, other) = ds[0]
    assert img.shape == (32, 32, 3)
    assert immune.shape == (32, 32) and other.shape == (32, 32)


def test_data_random_crop_tiling(tmp_path):
    from unet_torch_tpu.data.datasets import DataRandomCrop

    write_synthetic_dataset(str(tmp_path), n_images=1, size=48)
    ds = DataRandomCrop([str(tmp_path)], ch=3, augmentation=False,
                        train=False, crop_size=16)
    tiles, labels, dots = ds[0]
    assert tiles.shape == (9, 16, 16, 3)  # 48/16 = 3x3 tiles
    assert labels.shape == (9, 16, 16)
    ds_train = DataRandomCrop([str(tmp_path)], ch=3, augmentation=True,
                              train=True, crop_size=16)
    img, lbl, dot = ds_train[0]
    assert img.shape == (16, 16, 3)


def test_loader_process_sharding():
    """num_shards>1: same permutation per process, strided disjoint subsets,
    equal step counts (multi-host data parallelism, core/dist.py)."""
    from unet_torch_tpu.data.loader import NumpyLoader

    class Ds:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return np.asarray([i])

    seen = []
    for rank in range(4):
        loader = NumpyLoader(Ds(), batch_size=2, shuffle=True, seed=7,
                             shard_index=rank, num_shards=4, prefetch=0)
        got = [int(v) for b in loader for v in b.ravel()]
        assert len(got) == 3  # 13 // 4 — equal length, remainder dropped
        seen.append(set(got))
    all_items = set().union(*seen)
    assert sum(len(s) for s in seen) == len(all_items) == 12  # disjoint


def test_loader_num_workers_matches_serial():
    from unet_torch_tpu.data.loader import NumpyLoader

    class Ds:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.asarray([i, i * i])

    a = [b.tolist() for b in NumpyLoader(Ds(), 3, prefetch=0)]
    b = [b.tolist() for b in NumpyLoader(Ds(), 3, prefetch=2, num_workers=4)]
    assert a == b


def test_dataset_cache_identical_samples(tmp_path):
    """Cached (epoch>=2) samples bit-match the uncached first epoch."""
    from unet_torch_tpu.data.datasets import DataBinary
    from unet_torch_tpu.data.synthetic import write_synthetic_dataset

    root = write_synthetic_dataset(str(tmp_path / "d"), n_images=3, size=48)
    ds = DataBinary([root], ch=3, augmentation=False, input_size=(48, 48))
    first = [ds[i] for i in range(3)]
    second = [ds[i] for i in range(3)]  # cache hits
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
    assert ds._cache_used > 0


def test_nested_batch_mask_convention():
    """nested_batch pads mixed sizes, mask True ON padding (misc.py:324-326
    convention); bucketing bounds the jit-shape cache."""
    from unet_torch_tpu.data.nested import nested_batch

    a = np.ones((50, 70, 3), np.float32)
    b = np.ones((90, 40, 3), np.float32) * 2
    batch, mask = nested_batch([a, b], bucket=32)
    assert batch.shape == (2, 96, 96, 3) and mask.shape == (2, 96, 96)
    assert not mask[0, :50, :70].any() and mask[0, 50:, :].all()
    assert not mask[1, :90, :40].any() and mask[1, :, 40:].all()
    np.testing.assert_array_equal(batch[0, :50, :70], a)
    assert (batch[0, 50:, :] == 0).all()


def test_pad_and_tile_covers_margins():
    """Full-image coverage: the reference's val tiling drops non-multiple
    margins (DataLoader.py:826-842); pad_and_tile keeps them."""
    from unet_torch_tpu.data.nested import pad_and_tile

    img = np.arange(70 * 45, dtype=np.float32).reshape(70, 45)
    tiles, mtiles, (rows, cols) = pad_and_tile(img, 32)
    assert (rows, cols) == (3, 2) and tiles.shape == (6, 32, 32, 1)
    # reassemble: every original pixel present exactly once
    rec = np.zeros((96, 64), np.float32)
    k = 0
    for i in range(rows):
        for j in range(cols):
            rec[i*32:(i+1)*32, j*32:(j+1)*32] = tiles[k, :, :, 0]
            k += 1
    np.testing.assert_array_equal(rec[:70, :45], img)
    assert mtiles[0, 0, 0] == False and mtiles[-1, -1, -1] == True


def test_cltr_forward_with_nested_mask():
    """ConditionalDETR consumes the nested-batch padding mask end to end."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.data.nested import nested_batch
    from unet_torch_tpu.models.cltr.model import ConditionalDETR

    imgs = [np.random.RandomState(i).rand(48 + 16 * i, 64, 3).astype(
        np.float32) for i in range(2)]
    batch, mask = nested_batch(imgs, bucket=32)
    model = ConditionalDETR(num_queries=4, hidden_dim=32, nheads=4,
                            enc_layers=1, dec_layers=1, dim_feedforward=32)
    variables = model.init(jax.random.key(0), jnp.asarray(batch),
                           jnp.asarray(mask), train=False)
    out = model.apply(variables, jnp.asarray(batch), jnp.asarray(mask),
                      train=False)
    assert out["pred_logits"].shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_peak_local_max_skimage_semantics():
    """skimage defaults: exclude_border=min_distance, Chebyshev (p_norm=inf)
    suppression, suppressed candidates never suppress others."""
    img = np.zeros((32, 32))
    # border peak at (1, 16): within min_distance=3 of the edge -> excluded
    img[1, 16] = 1.0
    img[16, 16] = 0.9
    coords = peak_local_max(img, min_distance=3).tolist()
    assert [1, 16] not in coords and [16, 16] in coords
    # Chebyshev suppression: EQUAL-valued peaks at (10,10)/(13,13) are both
    # square-filter maxima, Euclidean ~4.24 (> 3) apart but Chebyshev 3 —
    # skimage's p_norm=inf suppresses the second; Euclidean would keep both
    img2 = np.zeros((32, 32))
    img2[10, 10] = 1.0
    img2[13, 13] = 1.0
    assert len(peak_local_max(img2, min_distance=3)) == 1
    # with min_distance=2 (Chebyshev 3 > 2) both survive
    assert len(peak_local_max(img2, min_distance=2)) == 2


def test_rgb2hed_golden_vectors():
    """Frozen golden vectors for the HED deconvolution, generated once with
    the published skimage.color.separate_stains algorithm (identical
    Ruifrok-Johnston rgb_from_hed constants, maximum(rgb,1e-6),
    log(rgb)/log(1e-6) @ inv(M), clip at 0) in float64.  Pins the constants
    and formula against drift."""
    from unet_torch_tpu.data.stain import rgb2hed

    pixels = np.array([[30, 60, 90], [200, 150, 180], [120, 20, 255],
                       [255, 255, 255], [0, 0, 0]], np.uint8).reshape(1, 5, 3)
    golden = np.array([
        [0.2386292504, 0.0, 0.0182842093],
        [0.0153181227, 0.0137509814, 0.0246877124],
        [0.0903187322, 0.1540972271, 0.0],
        [0.0, 0.0, 0.0],
        [1.2101673112, 0.0, 0.8819504551]])
    np.testing.assert_allclose(rgb2hed(pixels)[0], golden, atol=1e-9)


def test_macenko_frozen_regression_vectors():
    """Regression pin for the Macenko normaliser: a deterministic synthetic
    tile's stain matrix and normalised output are frozen (self-generated —
    staintools does not exist in this image to produce external vectors;
    the algorithmic steps follow the Macenko method as staintools implements
    it: OD -> eigh -> robust angle percentiles -> 99th-pct concentration
    scaling).  Any change to the pipeline's numerics breaks this loudly."""
    from unet_torch_tpu.data.stain import _macenko_stain_matrix

    rng = np.random.RandomState(3)
    img = np.full((32, 32, 3), 235, np.uint8)
    yy, xx = np.mgrid[:32, :32]
    for cy, cx, col in [(8, 8, (130, 80, 160)), (20, 22, (170, 120, 190)),
                        (14, 26, (110, 60, 140))]:
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= 25
        img[blob] = col
    img = np.clip(img.astype(int) + rng.randint(-8, 8, img.shape), 0,
                  255).astype(np.uint8)
    he = _macenko_stain_matrix(img)
    assert he.shape == (2, 3)
    # rows are unit-normalised OD directions
    np.testing.assert_allclose(np.linalg.norm(he, axis=1), [1.0, 1.0],
                               atol=1e-9)
    frozen = np.array([[0.5175554231, 0.7777861007, 0.3566302927],
                 [0.4020184690, 0.8611826307, 0.3110395909]])
    np.testing.assert_allclose(he, frozen, atol=1e-6)
