"""Report-suite oracle: our eval/reports.py accumulators vs the reference's
own Results2Class / Results3Class / ResultsCC classes executed from
/root/reference (test_mc3serousv5.py:131-855, test.py:159-372).

Both sides consume IDENTICAL synthetic (img, gt mask, prediction, gt dots)
sequences and write their CSV suites to separate dirs; the test asserts
CSV-for-CSV equality (column names AND values), pinning the artifact
contract the same way test_matching_vs_reference.py pins the matcher.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "benchmarks")


def _install_ref_stubs(monkeypatch_np_load=False):
    """Satisfy the reference scripts' heavyweight imports that are absent
    from this image (torchvision, skimage, staintools, seaborn, tqdm).
    None of the stubbed functionality is used by the accumulator classes
    themselves (verified: they need only cv2/numpy/pandas/matplotlib/scipy
    + CrowdMatching)."""
    sys.path.insert(0, BENCH)
    import torchvision_stub

    torchvision_stub.install()

    fake_measure = types.ModuleType("skimage.measure")
    fake_measure.label = None
    fake_color = types.ModuleType("skimage.color")
    fake_color.rgb2hed = None
    fake_feature = types.ModuleType("skimage.feature")
    fake_feature.peak_local_max = None
    fake_skimage = types.ModuleType("skimage")
    fake_skimage.measure = fake_measure
    fake_skimage.color = fake_color
    fake_skimage.feature = fake_feature
    for name, mod in (("skimage", fake_skimage),
                      ("skimage.measure", fake_measure),
                      ("skimage.color", fake_color),
                      ("skimage.feature", fake_feature)):
        sys.modules.setdefault(name, mod)

    if "tqdm" not in sys.modules:
        fake_tqdm = types.ModuleType("tqdm")
        fake_tqdm.tqdm = lambda it, *a, **k: it
        sys.modules["tqdm"] = fake_tqdm

    if "seaborn" not in sys.modules:
        fake_sns = types.ModuleType("seaborn")

        def histplot(data, *a, **k):
            import matplotlib

            matplotlib.use("Agg", force=True)
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.hist(np.asarray(data, dtype=float))

            class _R:
                def get_figure(self):
                    return fig

            return _R()

        fake_sns.histplot = histplot
        sys.modules["seaborn"] = fake_sns

    if "staintools" not in sys.modules:
        fake_st = types.ModuleType("staintools")

        class StainNormalizer:
            def __init__(self, *a, **k):
                pass

            def fit(self, *a, **k):
                pass

            def transform(self, x):
                return x

        fake_st.StainNormalizer = StainNormalizer
        sys.modules["staintools"] = fake_st

    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_mc():
    """Import the reference test_mc3serousv5 module (its module level loads a
    hardcoded stain-reference .npy — patch np.load around the import)."""
    _install_ref_stubs()
    real_load = np.load
    np.load = lambda *a, **k: np.zeros((8, 8, 3), np.uint8)
    try:
        import test_mc3serousv5 as ref
    finally:
        np.load = real_load
    return ref


@pytest.fixture(scope="module")
def ref_cc():
    _install_ref_stubs()
    import test as ref_test

    return ref_test


def _blob_mask(rng, size, n_classes, n_blobs=14):
    """Synthetic prediction/GT: filled circles of random class/size."""
    import cv2

    m = np.zeros((size, size), np.uint8)
    for _ in range(n_blobs):
        c = rng.randint(1, n_classes)
        x, y, r = rng.randint(10, size - 10), rng.randint(10, size - 10), \
            rng.randint(2, 6)
        cv2.circle(m, (x, y), r, int(c), -1)
    return m


def _dots(rng, size, n_classes, n=20):
    d = np.zeros((size, size), np.uint8)
    for _ in range(n):
        d[rng.randint(0, size), rng.randint(0, size)] = rng.randint(
            1, n_classes)
    return d


def _read_csvs(d):
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".csv"):
            with open(os.path.join(d, f)) as fh:
                out[f] = fh.read()
    return out


def _assert_csv_suites_equal(ref_dir, our_dir, files):
    ref_csvs, our_csvs = _read_csvs(ref_dir), _read_csvs(our_dir)
    for f in files:
        assert f in ref_csvs, f"reference did not write {f}"
        assert f in our_csvs, f"ours did not write {f}"
        ref_lines = ref_csvs[f].strip().splitlines()
        our_lines = our_csvs[f].strip().splitlines()
        assert our_lines[0] == ref_lines[0], (
            f"{f} header drift:\nref : {ref_lines[0]}\nours: {our_lines[0]}")
        assert len(our_lines) == len(ref_lines), f"{f} row count drift"
        for i, (rl, ol) in enumerate(zip(ref_lines, our_lines)):
            if rl == ol:
                continue
            # numeric tolerance fallback (summation-order 1-ulp noise)
            rv, ov = rl.split(","), ol.split(",")
            assert len(rv) == len(ov), f"{f} row {i} column count"
            for a, b in zip(rv, ov):
                if a == b:
                    continue
                np.testing.assert_allclose(float(a), float(b), rtol=1e-9,
                                           err_msg=f"{f} row {i}: {a} vs {b}")


def test_results2class_csvs_match_reference(ref_mc, tmp_path):
    from unet_torch_tpu.eval.reports import Results2Class

    rng = np.random.RandomState(3)
    # 512^2 images: the reference GMAE hardcodes its GAME grid to 512
    # (CrowdMatching.py:309-331); ours follows the true image size, so the
    # contracts only coincide at the reference's real patch size.
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir), os.makedirs(our_dir)
    r_ref = ref_mc.Results2Class(ref_dir, False)
    r_our = Results2Class(our_dir, save_image=False)
    for i in range(3):
        img = rng.randint(0, 255, (512, 512, 3), np.uint8)
        gt = _blob_mask(rng, 512, 3)
        pred = _blob_mask(rng, 512, 3)
        dot = _dots(rng, 512, 3)
        r_ref.imageNames.append(f"img{i}.png")
        # int64 dots for the reference: under numpy>=2 (NEP 50) its
        # uint64 np.sum counts wrap on `gt - pred` subtraction; int64
        # restores the numpy-1.x float-promotion era semantics the
        # reference was written against (our side casts to int anyway).
        r_ref.compareImages(img, gt, pred, dot.astype(np.int64))
        r_our.imageNames.append(f"img{i}.png")
        r_our.compare_images(img, gt, pred, dot)
    r_ref.save()
    r_our.save()
    _assert_csv_suites_equal(ref_dir, our_dir,
                             ["resultsData.csv", "resultsGridCount.csv",
                              "resultsMatching.csv", "results.csv",
                              "resultsC.csv"])


def test_results3class_csvs_match_reference(ref_mc, tmp_path):
    from unet_torch_tpu.eval.reports import Results3Class

    rng = np.random.RandomState(5)
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir), os.makedirs(our_dir)
    r_ref = ref_mc.Results3Class(ref_dir)
    # minimal fix for the reference's own bug: edList is appended to
    # (test_mc3serousv5.py:269) and reduced in save() but never initialised
    # in __init__ — the class crashes on its first true-positive match.
    # Our rebuild initialises it (the "edList bug" fix noted in PARITY.md).
    r_ref.edList = []
    r_our = Results3Class(our_dir, save_image=False)
    for i in range(3):
        img = rng.randint(0, 255, (96, 96, 3), np.uint8)
        gt = _blob_mask(rng, 96, 4)
        pred = _blob_mask(rng, 96, 4)
        r_ref.imageNames.append(f"img{i}.png")
        r_ref.compareImages(img, gt, pred)
        r_our.imageNames.append(f"img{i}.png")
        r_our.compare_images(img, gt, pred)
    r_ref.save()
    r_our.save()
    _assert_csv_suites_equal(ref_dir, our_dir,
                             ["resultsData.csv", "results.csv"])


def test_resultscc_csvs_match_reference(ref_cc, tmp_path):
    from unet_torch_tpu.eval.reports import ResultsCC

    rng = np.random.RandomState(7)
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir), os.makedirs(our_dir)
    r_ref = ref_cc.ResultsCC(ref_dir, False)
    r_our = ResultsCC(our_dir, save_img=False)
    for i in range(3):
        img = rng.randint(0, 255, (512, 512, 3), np.uint8)
        gt = (_blob_mask(rng, 512, 2) > 0).astype(np.uint8)
        pred = (_blob_mask(rng, 512, 2) > 0).astype(np.uint8)
        dot = (_dots(rng, 512, 2) > 0).astype(np.uint8)
        r_ref.imageNames.append(f"img{i}.png")
        # int64 for the reference — see test_results2class (NEP 50 wrap)
        r_ref.compareImages(img, gt, pred, dot.astype(np.int64))
        r_our.imageNames.append(f"img{i}.png")
        r_our.compare_images(img, gt, pred, dot)
    r_ref.save()
    r_our.save()
    _assert_csv_suites_equal(ref_dir, our_dir,
                             ["resultsData.csv", "resultsCount.csv",
                              "resultsMatching.csv"])
