"""Faint-cell label rescue (data/rescue.py): core/annulus geometry, id
assignment, overlay-root materialization, and loader compatibility."""

import os

import numpy as np
import pytest
from PIL import Image

from unetseg_tpu.data.rescue import build_overlay_root, rescue_frame


def _frame():
    silver = np.zeros((128, 128), np.uint16)
    silver[10:50, 10:50] = 3  # one real silver cell
    markers = np.zeros((128, 128), np.uint16)
    markers[20:25, 20:25] = 7    # covered marker (inside the silver cell)
    markers[90:95, 90:95] = 9    # MISSING marker (pure background)
    return silver, markers


def test_rescue_frame_geometry():
    silver, markers = _frame()
    out, ignore, n = rescue_frame(
        silver, markers, core_radius=10.0, ignore_radius=25.0
    )
    assert n == 1
    new = (out > 0) & ~(silver > 0)
    assert new.sum() > 0
    # the new core carries a fresh id, silver labels untouched
    assert set(np.unique(out[new])) == {4}
    np.testing.assert_array_equal(out[silver > 0], silver[silver > 0])
    # the core contains the marker and respects the radius
    assert (out[90:95, 90:95] == 4).all()
    ys, xs = np.nonzero(new)
    assert ys.min() >= 90 - 11 and ys.max() <= 94 + 11
    # annulus surrounds the core, never overlaps labels
    assert ignore.sum() > 0
    assert not (ignore & (out > 0)).any()
    # annulus is within ignore_radius of the marker
    yi, xi = np.nonzero(ignore)
    assert yi.min() >= 90 - 26 and yi.max() <= 94 + 26


def test_rescue_frame_covered_marker_untouched():
    silver, markers = _frame()
    markers[90:95, 90:95] = 0  # only the covered marker remains
    out, ignore, n = rescue_frame(silver, markers)
    assert n == 0
    np.testing.assert_array_equal(out, silver)
    assert not ignore.any()


def test_rescue_core_clips_against_silver():
    silver = np.zeros((64, 64), np.uint16)
    silver[0:32, :] = 5
    markers = np.zeros((64, 64), np.uint16)
    markers[34:36, 30:32] = 1  # missing marker right next to the cell
    out, _, n = rescue_frame(silver, markers, core_radius=8, ignore_radius=16)
    assert n == 1
    # the silver cell is never overwritten
    np.testing.assert_array_equal(out[0:32, :], silver[0:32, :])


@pytest.fixture
def tiny_root(tmp_path):
    root = tmp_path / "HeLa"
    (root / "01").mkdir(parents=True)
    (root / "01_ST" / "SEG").mkdir(parents=True)
    (root / "01_ST" / "WEIGHT_MAPS").mkdir(parents=True)
    (root / "01_GT" / "TRA").mkdir(parents=True)
    (root / "02").mkdir(parents=True)
    (root / "02_ST" / "SEG").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rs.rand(128, 128) * 255).astype(np.uint8)).save(
            root / "01" / f"t{i:03d}.tif"
        )
        silver, markers = _frame()
        Image.fromarray(silver).save(root / "01_ST" / "SEG" / f"man_seg{i:03d}.tif")
        np.save(root / "01_ST" / "WEIGHT_MAPS" / f"weight_map_{i:03d}.npy",
                np.ones((128, 128)))
        if i < 2:  # frame 2 has no gold markers at all
            Image.fromarray(markers).save(
                root / "01_GT" / "TRA" / f"man_track{i:03d}.tif"
            )
    return str(root)


def test_build_overlay_root(tiny_root, tmp_path):
    out_root = str(tmp_path / "overlay")
    stats = build_overlay_root(
        tiny_root, out_root, rescue_sequences=["01"],
        passthrough_sequences=["02"],
        core_radius=10, ignore_radius=25, core_weight=3.0,
    )
    st = stats["01"]
    assert st.frames_seen == 3 and st.frames_rescued == 2
    assert st.markers_missing == 2
    # images + GT symlinked, rescued masks written, frame 2 passthrough
    assert os.path.islink(os.path.join(out_root, "01"))
    assert os.path.islink(os.path.join(out_root, "02_ST"))
    m0 = np.array(Image.open(
        os.path.join(out_root, "01_ST", "SEG", "man_seg000.tif")
    ))
    assert m0.max() == 4  # rescued core id
    m2 = np.array(Image.open(
        os.path.join(out_root, "01_ST", "SEG", "man_seg002.tif")
    ))
    assert m2.max() == 3  # untouched
    # weight map: annulus zeroed, core boosted
    wm = np.load(os.path.join(out_root, "01_ST", "WEIGHT_MAPS",
                              "weight_map_000.npy"))
    core = (m0 == 4)
    assert (wm[core] >= 3.0).all()
    assert (wm == 0).sum() > 0
    # the overlay root loads through the standard dataset loader
    from unetseg_tpu.core.config import DataConfig
    from unetseg_tpu.data.dataset import HeLaArrays

    arrays = HeLaArrays.load(DataConfig(
        data_root=out_root, sequence="01", image_size=128,
    ))
    assert len(arrays) == 3
    assert (arrays.weight_maps[0] == 0).sum() > 0  # annulus survived resize


def test_build_overlay_root_forwards_weight_map_settings(tiny_root, tmp_path):
    """Rescued frames' regenerated weight maps must honor the dataset's
    preprocess w0/sigma/mode or the overlay root mixes two weight-map
    formulas between rescued and passthrough frames (advisor round-4)."""
    a = str(tmp_path / "ov_a")
    b = str(tmp_path / "ov_b")
    build_overlay_root(tiny_root, a, rescue_sequences=["01"],
                       core_radius=10, ignore_radius=25, w0=10.0, sigma=5.0)
    build_overlay_root(tiny_root, b, rescue_sequences=["01"],
                       core_radius=10, ignore_radius=25, w0=30.0, sigma=2.0)
    wa = np.load(os.path.join(a, "01_ST", "WEIGHT_MAPS", "weight_map_000.npy"))
    wb = np.load(os.path.join(b, "01_ST", "WEIGHT_MAPS", "weight_map_000.npy"))
    assert not np.array_equal(wa, wb)
    # CLI exposes and forwards the settings
    from unetseg_tpu.cli.main import build_parser
    args = build_parser().parse_args([
        "rescue-labels", "--data-root", tiny_root, "--output-root", a,
        "--rescue-sequences", "01", "--w0", "30", "--sigma", "2",
        "--mode", "paper",
    ])
    assert args.w0 == 30.0 and args.sigma == 2.0 and args.mode == "paper"
