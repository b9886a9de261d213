"""Track-id relabeling for CTC-conformant result images."""

import numpy as np

from unetseg_tpu.track.ctc_io import relabel_by_track
from unetseg_tpu.track.tracker import Tracker


def test_relabel_by_track_basic():
    mask = np.array([[0, 1, 1], [2, 2, 0]], np.uint16)
    out = relabel_by_track(mask, {1: 7, 2: 9})
    np.testing.assert_array_equal(out, [[0, 7, 7], [9, 9, 0]])
    assert out.dtype == np.uint16


def test_relabel_unassigned_labels_become_background():
    mask = np.array([[3, 0], [0, 3]], np.uint16)
    out = relabel_by_track(mask, {})
    assert out.sum() == 0


def test_relabel_consistency_across_frames():
    """The same physical cell keeps the same pixel label across frames after
    relabeling, regardless of per-frame CC label churn."""
    def frame(label, y):
        m = np.zeros((32, 32), np.uint16)
        m[y : y + 8, 10:18] = label
        return m

    masks = [frame(5, 4), frame(2, 5), frame(9, 6)]  # CC labels churn
    tr = Tracker()
    relabeled = [
        relabel_by_track(m, tr.update(m, i)) for i, m in enumerate(masks)
    ]
    ids = {int(r.max()) for r in relabeled}
    assert ids == {1}  # one track id everywhere
