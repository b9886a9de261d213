"""EDT + weight-map tests, including golden parity with the reference's
shipped weight_map_*.npy artifacts."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference_data
from unetseg_tpu.ops.edt import distance_transform_edt, edt, edt_sq
from unetseg_tpu.ops.weight_maps import (
    class_balance_weights_np,
    pack_labels,
    weight_map_device,
    weight_map_np,
)


# ----------------------------------------------------------------------- EDT
def test_edt_matches_scipy_exactly():
    from scipy.ndimage import distance_transform_edt as sp_edt

    rs = np.random.RandomState(0)
    x = (rs.rand(48, 57) > 0.9).astype(np.uint8)  # sparse features
    ours = np.asarray(distance_transform_edt(jnp.asarray(1 - x)))  # dist from nonzero(1-x) to zeros(=x)
    ref = sp_edt(1 - x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_sq_empty_features_is_big():
    d = np.asarray(edt_sq(jnp.zeros((8, 8), bool)))
    assert (d > 1e10).all()


def test_edt_single_feature_pixel():
    f = np.zeros((16, 16), bool)
    f[5, 7] = True
    d = np.asarray(edt(jnp.asarray(f)))
    yy, xx = np.mgrid[0:16, 0:16]
    ref = np.sqrt((yy - 5.0) ** 2 + (xx - 7.0) ** 2)
    np.testing.assert_allclose(d, ref, atol=1e-4)


# --------------------------------------------------------------- weight maps
def _toy_mask():
    m = np.zeros((40, 40), np.uint16)
    m[5:15, 5:15] = 1
    m[5:15, 20:30] = 2
    m[25:35, 10:25] = 7  # non-consecutive label
    return m


def test_class_balance_weights():
    m = _toy_mask()
    wc = class_balance_weights_np(m)
    n_fg = (m > 0).sum()
    n_bg = m.size - n_fg
    assert np.allclose(wc[m > 0], m.size / n_fg)
    assert np.allclose(wc[m == 0], m.size / n_bg)


def test_reference_mode_degenerates_to_wc_plus_w0():
    """The reference's min-of-two-EDTs is identically zero -> w = wc + w0.
    This is the documented fidelity quirk (see ops/weight_maps.py)."""
    m = _toy_mask()
    w = weight_map_np(m, w0=10.0, sigma=5.0, mode="reference")
    wc = class_balance_weights_np(m)
    np.testing.assert_allclose(w, wc + 10.0, atol=1e-5)


def test_paper_mode_highlights_gaps_between_cells():
    m = _toy_mask()
    w = weight_map_np(m, w0=10.0, sigma=5.0, mode="paper")
    wc = class_balance_weights_np(m)
    sep = w - wc
    # between cells 1 and 2 (rows 5-15, cols 15-20) separation must be strong
    gap = sep[8:12, 16:19]
    far = sep[38, 38]
    assert gap.min() > 1.0
    assert far < 0.2
    # inside cells the term is off (background_only)
    assert np.allclose(sep[m > 0], 0.0, atol=1e-6)


def test_device_weight_map_matches_host_paper_mode():
    m = _toy_mask()
    host = weight_map_np(m, w0=10.0, sigma=5.0, mode="paper")
    dev = np.asarray(
        weight_map_device(jnp.asarray(m.astype(np.int32)), jnp.asarray(pack_labels(m)))
    )
    np.testing.assert_allclose(dev, host, atol=1e-3)


def test_pack_labels():
    m = _toy_mask()
    labs = pack_labels(m)
    assert labs.shape == (32,)
    assert list(labs[:3]) == [1, 2, 7]
    assert (labs[3:] == -1).all()


def test_pack_labels_buckets_crowded_frames():
    """Realistic HeLa frames carry 30-70 instances; the label axis must round
    up to the next static bucket instead of raising at a hard cap of 32."""
    m = np.zeros((40, 40), np.uint16)
    for lab in range(1, 51):  # 50 instances
        r, c = divmod(lab - 1, 10)
        m[4 * r : 4 * r + 3, 4 * c : 4 * c + 3] = lab
    labs = pack_labels(m)
    assert labs.shape == (64,)
    assert (labs[:50] == np.arange(1, 51)).all()
    assert (labs[50:] == -1).all()
    with np.testing.assert_raises(ValueError):
        pack_labels(m, max_instances=32)


def test_weight_map_empty_mask():
    m = np.zeros((16, 16), np.uint16)
    w = weight_map_np(m, mode="reference")
    # wc_fg = 0 (no fg), bg weight = 1.0; sep = w0 * exp(0) = 10
    np.testing.assert_allclose(w, 1.0 + 10.0, atol=1e-5)


def test_weight_map_single_instance():
    m = np.zeros((20, 20), np.uint16)
    m[5:10, 5:10] = 3
    w = weight_map_np(m, mode="paper")
    assert np.isfinite(w).all()


# ------------------------------------------------------------------- goldens
@requires_reference_data
def test_golden_parity_with_reference_artifacts():
    """Recompute weight maps from the reference's own masks and compare with
    its shipped .npy artifacts (reference data tree, SURVEY.md §2 C5)."""
    from PIL import Image

    base = os.path.join(REFERENCE_ROOT, "data/raw/train/DIC-C2DH-HeLa/01_ST")
    for num in ["000", "010"]:
        mask = np.array(Image.open(os.path.join(base, "SEG", f"man_seg{num}.tif")))
        golden = np.load(os.path.join(base, "WEIGHT_MAPS", f"weight_map_{num}.npy"))
        ours = weight_map_np(mask, w0=10.0, sigma=5.0, mode="reference")
        np.testing.assert_allclose(ours, golden.astype(np.float32), atol=1e-4)
