"""CTC measures validated against the golden values + op-count log shipped
with the reference's evaluation software (EvaluationSoftware/testing_dataset
and 'Evaluation software.pdf': SEG 01=0.232874, 02=0.443686; TRA 03=0.622980;
DET 03=0.688000, 0.700000 without the extra-detection penalty)."""

import os
import shutil

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference_data
from unetseg_tpu.metrics import ctc

TD = os.path.join(REFERENCE_ROOT, "EvaluationSoftware", "testing_dataset")

HAVE_COMPILER = shutil.which("g++") is not None
BACKENDS = (["native"] if HAVE_COMPILER else []) + ["python"]


# ------------------------------------------------------------------ goldens
@requires_reference_data
@pytest.mark.parametrize("backend", BACKENDS)
def test_seg_golden_seq01(backend):
    r = ctc.seg_measure(
        os.path.join(TD, "01_GT", "SEG"), os.path.join(TD, "01_RES"), backend=backend
    )
    assert abs(r.value - 0.232874) < 5e-7, r.value


@requires_reference_data
def test_seg_seq02_result_data_not_shipped():
    """The PDF's seq-02 golden (0.443686) is unverifiable: the reference's
    copy of the testing dataset ships 02_GT (3D sparse-slice convention,
    man_seg_{T}_{Z}.tif) but no 02_RES. The loader still recognizes the
    convention and reports the missing results cleanly."""
    with pytest.raises(FileNotFoundError):
        ctc.seg_measure(
            os.path.join(TD, "02_GT", "SEG"), os.path.join(TD, "02_RES")
        )


@requires_reference_data
@pytest.mark.parametrize("backend", BACKENDS)
def test_tra_det_golden_seq03(backend):
    r = ctc.tra_measure(
        os.path.join(TD, "03_GT", "TRA"), os.path.join(TD, "03_RES"), backend=backend
    )
    assert abs(r.tra - 0.622980) < 5e-7, (r.tra, r.counts)
    assert abs(r.det - 0.688000) < 5e-7, (r.det, r.counts)
    assert abs(r.det_without_fp_penalty - 0.700000) < 5e-7


@requires_reference_data
@pytest.mark.parametrize("backend", BACKENDS)
def test_tra_op_counts_match_official_log(backend):
    """The official TRA_log.txt for seq 03 lists every graph operation:
    5 NS, 5 FN, 3 FP, 1 ED, 16 EA, 2 EC -> AOGM=105, and V=25, E=19
    -> AOGM_0=278.5."""
    r = ctc.tra_measure(
        os.path.join(TD, "03_GT", "TRA"), os.path.join(TD, "03_RES"), backend=backend
    )
    c = r.counts
    assert c["NS"] == 5
    assert c["FN"] == 5
    assert c["FP"] == 3
    assert c["ED"] == 1
    assert c["EA"] == 16
    assert c["EC"] == 2
    assert c["V_gt"] == 25
    assert c["E_gt"] == 19
    assert r.aogm == 105.0
    assert r.aogm0 == 278.5


@requires_reference_data
def test_native_and_python_agree_fully():
    if not HAVE_COMPILER:
        pytest.skip("no compiler")
    a = ctc.tra_measure(os.path.join(TD, "03_GT", "TRA"), os.path.join(TD, "03_RES"), backend="native")
    b = ctc.tra_measure(os.path.join(TD, "03_GT", "TRA"), os.path.join(TD, "03_RES"), backend="python")
    assert a.counts == b.counts
    assert abs(a.tra - b.tra) < 1e-12
    s1 = ctc.seg_measure(os.path.join(TD, "01_GT", "SEG"), os.path.join(TD, "01_RES"), backend="native")
    s2 = ctc.seg_measure(os.path.join(TD, "01_GT", "SEG"), os.path.join(TD, "01_RES"), backend="python")
    np.testing.assert_allclose(s1.per_object, s2.per_object, atol=1e-12)


# ------------------------------------------------------------- synthetic
def _square(label, y, x, size=4, shape=(32, 32)):
    m = np.zeros(shape, np.uint16)
    m[y : y + size, x : x + size] = label
    return m


@pytest.mark.parametrize("backend", BACKENDS)
def test_seg_perfect_match(backend):
    gt = [_square(1, 4, 4)]
    res = [_square(7, 4, 4)]
    r = ctc.seg_measure_arrays(gt, res, backend=backend)
    assert r.value == 1.0
    assert r.n_objects == 1


@pytest.mark.parametrize("backend", BACKENDS)
def test_seg_majority_rule_strict(backend):
    """Exactly half overlap fails the strict |R∩G| > 0.5|G| test."""
    gt = [_square(1, 0, 0, size=4)]
    res_half = np.zeros((32, 32), np.uint16)
    res_half[0:2, 0:4] = 3  # covers exactly 8/16 = half
    r = ctc.seg_measure_arrays(gt, [res_half], backend=backend)
    assert r.value == 0.0
    res_more = res_half.copy()
    res_more[2, 0] = 3  # 9/16 > half
    r2 = ctc.seg_measure_arrays(gt, [res_more], backend=backend)
    assert r2.value == pytest.approx(9 / 16)  # inter 9, union 16+9-9=16


@pytest.mark.parametrize("backend", BACKENDS)
def test_tra_perfect_tracking(backend):
    from unetseg_tpu.track.tracker import CellTrack

    gt = [_square(1, 4, 4), _square(1, 5, 4)]
    res = [_square(2, 4, 4), _square(2, 5, 4)]
    gt_tracks = [CellTrack(1, 0, 1, 0)]
    res_tracks = [CellTrack(2, 0, 1, 0)]
    r = ctc.tra_det_arrays(gt, res, gt_tracks, res_tracks, backend=backend)
    assert r.tra == 1.0 and r.det == 1.0
    assert r.aogm == 0.0


@pytest.mark.parametrize("backend", BACKENDS)
def test_tra_missed_cell_costs_fn_and_ea(backend):
    from unetseg_tpu.track.tracker import CellTrack

    gt = [_square(1, 4, 4), _square(1, 5, 4)]
    res = [_square(2, 4, 4), np.zeros((32, 32), np.uint16)]
    gt_tracks = [CellTrack(1, 0, 1, 0)]
    res_tracks = [CellTrack(2, 0, 0, 0)]
    r = ctc.tra_det_arrays(gt, res, gt_tracks, res_tracks, backend=backend)
    # one FN vertex (frame 1) + the GT edge must be added
    assert r.counts["FN"] == 1
    assert r.counts["EA"] == 1
    assert r.aogm == 10 + 1.5


@pytest.mark.parametrize("backend", BACKENDS)
def test_division_semantics_edge(backend):
    """Parent link in GT vs track link in RES -> EC (wrong semantics)."""
    from unetseg_tpu.track.tracker import CellTrack

    f0 = _square(1, 4, 4)
    f1 = _square(2, 4, 4)
    gt_tracks = [CellTrack(1, 0, 0, 0), CellTrack(2, 1, 1, 1)]  # parent link
    res_tracks = [CellTrack(1, 0, 1, 0)]  # same label continues = track link
    res = [_square(1, 4, 4), _square(1, 4, 4)]
    r = ctc.tra_det_arrays([f0, f1], res, gt_tracks, res_tracks, backend=backend)
    assert r.counts["EC"] == 1
    assert r.counts["EA"] == 0
    assert r.counts["ED"] == 0


@pytest.mark.parametrize("backend", BACKENDS)
def test_split_detection_ns(backend):
    """Two GT cells covered by one result blob -> 1 NS op."""
    from unetseg_tpu.track.tracker import CellTrack

    gt = np.zeros((32, 32), np.uint16)
    gt[4:8, 4:8] = 1
    gt[4:8, 10:14] = 2
    res = np.zeros((32, 32), np.uint16)
    res[4:8, 4:14] = 9
    r = ctc.tra_det_arrays(
        [gt], [res],
        [CellTrack(1, 0, 0, 0), CellTrack(2, 0, 0, 0)],
        [CellTrack(9, 0, 0, 0)],
        backend=backend,
    )
    assert r.counts["NS"] == 1
    assert r.counts["FP"] == 0
    assert r.counts["FN"] == 0
