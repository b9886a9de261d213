"""IoU / Dice / Rand tests, including exact parity of the vectorized Rand
index with the reference's per-pixel formula."""

import numpy as np
import pytest

from unetseg_tpu.metrics.binary import batch_mean_iou, dice, iou
from unetseg_tpu.metrics.rand import contingency_table, rand_index_and_error


def test_iou_basic():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10))
    a[:5] = 1
    b[:5] = 1
    assert iou(a, b) == 1.0
    b[:] = 0
    b[5:] = 1
    assert iou(a, b) == 0.0


def test_iou_empty_masks_is_one():
    assert iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_iou_binarizes_255_and_labels():
    a = np.zeros((6, 6))
    a[:3] = 255
    b = np.zeros((6, 6))
    b[:3] = 7  # instance labels binarize too (reference: utils/metrics.py:30)
    assert iou(a, b) == 1.0


def test_dice_vs_iou_relation():
    rs = np.random.RandomState(0)
    a = rs.rand(32, 32) > 0.5
    b = rs.rand(32, 32) > 0.5
    i = iou(a, b)
    d = dice(a, b)
    assert abs(d - 2 * i / (1 + i)) < 1e-12


def test_batch_mean_iou():
    a = np.zeros((2, 4, 4))
    b = np.zeros((2, 4, 4))
    a[0, :2] = 1
    b[0, :2] = 1  # item 0: IoU 1
    a[1, :2] = 1
    b[1, 2:] = 1  # item 1: IoU 0
    assert batch_mean_iou(a, b) == 0.5


def _reference_rand(gt, pred):
    """Direct transcription of the reference's formula with its explicit
    contingency loop (utils/metrics.py:108-147) for parity checking."""
    gt_flat = gt.flatten()
    pred_flat = pred.flatten()
    n = len(gt_flat)
    total_pairs = n * (n - 1) / 2.0
    gl = {l: i for i, l in enumerate(np.unique(gt_flat))}
    pl = {l: i for i, l in enumerate(np.unique(pred_flat))}
    cont = np.zeros((len(gl), len(pl)), int)
    for i in range(n):
        cont[gl[gt_flat[i]], pl[pred_flat[i]]] += 1
    a = np.sum(cont * (cont - 1) / 2)
    sg = np.sum(cont.sum(1) * (cont.sum(1) - 1) / 2)
    sp = np.sum(cont.sum(0) * (cont.sum(0) - 1) / 2)
    b = total_pairs - sg - sp + a
    ri = (a + b) / total_pairs
    return ri, 1 - ri


def test_rand_matches_reference_formula_exactly():
    rs = np.random.RandomState(1)
    gt = (rs.rand(24, 24) * 4).astype(np.uint16)
    pred = (rs.rand(24, 24) * 3).astype(np.uint16)
    ours = rand_index_and_error(gt, pred)
    ref = _reference_rand(gt, pred)
    assert abs(ours[0] - ref[0]) < 1e-12
    assert abs(ours[1] - ref[1]) < 1e-12


def test_rand_perfect_agreement():
    m = (np.random.RandomState(2).rand(16, 16) * 5).astype(int)
    ri, err = rand_index_and_error(m, m + 100)  # label ids may differ
    assert ri == 1.0 and err == 0.0


def test_rand_tiny_input():
    assert rand_index_and_error(np.zeros((1, 1)), np.zeros((1, 1))) == (1.0, 0.0)


def test_contingency_table_counts():
    a = np.array([[0, 0], [1, 1]])
    b = np.array([[0, 1], [1, 1]])
    t = contingency_table(a, b)
    assert t.sum() == 4
    assert t[0, 0] == 1 and t[0, 1] == 1 and t[1, 1] == 2
