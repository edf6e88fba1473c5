"""Cross-validation: our closed-form crowd-matching vs the reference's own
implementation executed from /root/reference (Gaussian-stamping loop).

The reference module needs skimage only for the 'Regression' input type; a
stub satisfies the import so the 'Coordinates' path runs as-is.
"""

import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reference_cm():
    fake_feature = types.ModuleType("skimage.feature")
    fake_feature.peak_local_max = None
    fake_skimage = types.ModuleType("skimage")
    fake_skimage.feature = fake_feature
    sys.modules.setdefault("skimage", fake_skimage)
    sys.modules.setdefault("skimage.feature", fake_feature)
    sys.path.insert(0, "/root/reference")
    import CrowdMatching as ref

    return ref


def _random_case(rng, n_gt=12, n_pred=15, size=96):
    g_dot = np.zeros((size, size), np.float64)
    ys = rng.randint(0, size, n_gt)
    xs = rng.randint(0, size, n_gt)
    g_dot[ys, xs] = 1
    e_x = rng.randint(0, size, n_pred)
    e_y = rng.randint(0, size, n_pred)
    return g_dot, (np.array(e_x), np.array(e_y))


def test_crowd_matching_grid_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import crowd_matching_test

    rng = np.random.RandomState(7)
    sigma_list = [5, 20]
    thresh_list = list(np.arange(0.5, 1, 0.05))
    for trial in range(3):
        g_dot, coords = _random_case(rng)
        ref_p, ref_r, ref_f = reference_cm.CrowdMatchingTest(
            g_dot.copy(), coords, sigma_list, thresh_list,
            inputType="Coordinates")
        our_p, our_r, our_f = crowd_matching_test(
            g_dot, coords, sigma_list, thresh_list,
            input_type="Coordinates")
        np.testing.assert_allclose(our_p, ref_p, atol=1e-9)
        np.testing.assert_allclose(our_r, ref_r, atol=1e-9)
        np.testing.assert_allclose(our_f, ref_f, atol=1e-9)


def test_crowd_matching_empty_gt_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import crowd_matching_test

    g_dot = np.zeros((32, 32))
    coords = (np.array([5]), np.array([6]))
    ref = reference_cm.CrowdMatchingTest(g_dot.copy(), coords, [5], [0.5],
                                         inputType="Coordinates")
    ours = crowd_matching_test(g_dot, coords, [5], [0.5],
                               input_type="Coordinates")
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b)


def test_greedy_matching_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import crowd_matching_greedy

    rng = np.random.RandomState(3)
    for _ in range(3):
        g_dot, coords = _random_case(rng, n_gt=8, n_pred=10, size=64)
        ref = reference_cm.CrowdMatchingTest2(g_dot.copy(), coords, 10)
        ours = crowd_matching_greedy(g_dot, coords, 10)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_gmae_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import gmae

    rng = np.random.RandomState(11)
    gt = (rng.rand(512, 512) > 0.999).astype(np.float64)
    pred = (rng.rand(512, 512) > 0.999).astype(np.float64)
    for L in (1, 2, 3):
        np.testing.assert_allclose(gmae(L, gt, pred, 512),
                                   reference_cm.GMAE(L, gt, pred))


def test_count_accuracy_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import count_accuracy_metric

    for gt, pr in [(10, 12), (0, 5), (7, 0), (100, 98)]:
        np.testing.assert_allclose(count_accuracy_metric(gt, pr),
                                   reference_cm.countAccuracyMetric(gt, pr))


def test_matlab_gauss_matches_reference(reference_cm):
    from unet_torch_tpu.eval.matching import matlab_style_gauss

    np.testing.assert_allclose(
        matlab_style_gauss((41, 41), 5.0),
        reference_cm.matlab_style_gauss((41, 41), 5.0))
