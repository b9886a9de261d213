"""Tracker tests: vectorized IoU parity with the rasterization definition,
matching/division semantics on synthetic lineages, CTC file IO."""

import numpy as np
import pytest

from unetseg_tpu.core.config import TrackConfig
from unetseg_tpu.track.ctc_io import read_track_file, write_res_track
from unetseg_tpu.track.iou import pairwise_iou
from unetseg_tpu.track.tracker import CellTrack, Tracker, track_sequence_masks


# ------------------------------------------------------------------- helpers
def blob(mask, label, y0, y1, x0, x1):
    mask[y0:y1, x0:x1] = label
    return mask


def frame(*blobs, shape=(64, 64)):
    m = np.zeros(shape, np.uint16)
    for label, y0, y1, x0, x1 in blobs:
        blob(m, label, y0, y1, x0, x1)
    return m


# ----------------------------------------------------------------------- IoU
def test_pairwise_iou_matches_rasterized_definition():
    """Histogram IoU == the reference's per-pair boolean-mask IoU
    (reference: scripts/track.py:73-100)."""
    rs = np.random.RandomState(0)
    a = (rs.rand(40, 40) * 4).astype(np.uint16)
    b = (rs.rand(40, 40) * 4).astype(np.uint16)
    iou, pl, cl = pairwise_iou(a, b)
    for i, p in enumerate(pl):
        for j, c in enumerate(cl):
            m1 = a == p
            m2 = b == c
            union = np.logical_or(m1, m2).sum()
            ref = np.logical_and(m1, m2).sum() / union if union else 0.0
            assert abs(iou[i, j] - ref) < 1e-12


def test_pairwise_iou_empty():
    iou, pl, cl = pairwise_iou(np.zeros((8, 8)), np.zeros((8, 8)))
    assert iou.shape == (0, 0) and pl == [] and cl == []


def test_pairwise_iou_nonconsecutive_labels():
    a = frame((5, 0, 10, 0, 10))
    b = frame((9, 0, 10, 0, 10))
    iou, pl, cl = pairwise_iou(a, b)
    assert pl == [5] and cl == [9]
    assert iou[0, 0] == 1.0


# ------------------------------------------------------------------- tracker
def test_simple_continuation():
    masks = [
        frame((1, 10, 20, 10, 20)),
        frame((1, 11, 21, 10, 20)),   # same cell moved 1px
        frame((1, 12, 22, 10, 20)),
    ]
    tracks = track_sequence_masks(masks)
    assert len(tracks) == 1
    t = tracks[0]
    assert (t.start_frame, t.end_frame, t.parent_label) == (0, 2, 0)


def test_appearance_starts_new_track():
    masks = [
        frame((1, 10, 20, 10, 20)),
        frame((1, 10, 20, 10, 20), (2, 40, 50, 40, 50)),
    ]
    tracks = track_sequence_masks(masks)
    assert len(tracks) == 2
    assert tracks[1].start_frame == 1 and tracks[1].parent_label == 0


def test_disappearance_ends_track():
    masks = [
        frame((1, 10, 20, 10, 20), (2, 40, 50, 40, 50)),
        frame((1, 10, 20, 10, 20)),
        frame((1, 10, 20, 10, 20)),
    ]
    tracks = track_sequence_masks(masks)
    ends = sorted((t.start_frame, t.end_frame) for t in tracks)
    assert ends == [(0, 0), (0, 2)]


def test_division_two_children():
    """Parent splits into two touching halves -> parent ends at t-1, two
    children with parent link (reference: scripts/track.py:198-243)."""
    parent = frame((1, 20, 40, 20, 40))
    # each child has IoU 100/400 = 0.25 with the parent: below the 1-to-1
    # threshold (0.3) but above the division threshold (0.1)
    children = frame((1, 20, 30, 20, 30), (2, 30, 40, 30, 40))
    tracks = track_sequence_masks([parent, children])
    assert len(tracks) == 3
    p = tracks[0]
    assert p.end_frame == 0  # ends the frame before the split
    kids = [t for t in tracks if t.parent_label == p.label]
    assert len(kids) == 2
    assert all(t.start_frame == 1 for t in kids)


def test_three_overlaps_is_not_division():
    """> max_children candidates -> no division; all become new tracks
    (reference: :226 requires len <= 2)."""
    parent = frame((1, 10, 50, 10, 50))
    three = frame(
        (1, 10, 50, 10, 20), (2, 10, 50, 25, 35), (3, 10, 50, 40, 50)
    )
    tracks = track_sequence_masks([parent, three])
    # pieces have IoU 400/1600 = 0.25 each: < 0.3 (no 1-to-1 match) but
    # >= 0.1, giving three division candidates -> exceeds max_children
    assert all(t.parent_label == 0 for t in tracks)
    assert len(tracks) == 4


def test_low_iou_no_match_starts_new_track():
    masks = [
        frame((1, 0, 10, 0, 10)),
        frame((1, 30, 40, 30, 40)),  # zero overlap
    ]
    tracks = track_sequence_masks(masks)
    assert len(tracks) == 2


def test_track_ids_and_frame_numbers_offset():
    masks = [frame((1, 0, 10, 0, 10)), frame((1, 0, 10, 0, 10))]
    tracks = track_sequence_masks(masks, frame_nums=[5, 6])
    assert tracks[0].start_frame == 5 and tracks[0].end_frame == 6


def test_assignments_mapping():
    tr = Tracker()
    a0 = tr.update(frame((3, 0, 10, 0, 10)), 0)
    a1 = tr.update(frame((7, 1, 11, 0, 10)), 1)
    assert a0 == {3: 1}
    assert a1 == {7: 1}  # same track id under a different CC label


def test_faithful_active_map_keeps_stale_entries():
    """The reference never clears disappeared labels; a label-id reuse can
    resurrect a dead track (documented divergence)."""
    m0 = frame((1, 0, 10, 0, 10), (2, 40, 50, 40, 50))
    m1 = frame((1, 0, 10, 0, 10))                      # label 2 disappears
    m2 = frame((1, 0, 10, 0, 10), (2, 40, 50, 40, 50))  # reappears, same spot

    fixed = track_sequence_masks([m0, m1, m2])
    # fixed: stale 2 cleared; reappearance = brand-new track
    assert len(fixed) == 3

    faithful = track_sequence_masks([m0, m1, m2], faithful_active_map=True)
    # faithful: new track as well *but* the matching path differs only when a
    # prev-frame label collides with a stale key; with no prev label 2 in m1
    # there is no pair to match, so counts agree here
    assert len(faithful) == 3


def test_division_from_matched_mode():
    """Improved mode (the default): a matched daughter plus an unmatched
    sibling at the division threshold is reinterpreted as a division;
    division_from_matched=False restores reference semantics."""
    parent = frame((1, 20, 40, 20, 40))            # 400 px
    # daughter1 wins the 1-1 match (IoU 240/400 = 0.6 > 0.3 but <= cap),
    # daughter2 overlaps at 160/400 = 0.4 >= 0.1
    daughters = frame((1, 20, 32, 20, 40), (2, 32, 40, 20, 40))
    ref = track_sequence_masks(
        [parent, daughters], cfg=TrackConfig(division_from_matched=False)
    )
    assert all(t.parent_label == 0 for t in ref)   # reference semantics miss it
    got = track_sequence_masks(
        [parent, daughters],
        cfg=TrackConfig(division_from_matched=True, matched_division_iou_cap=0.6),
    )
    kids = [t for t in got if t.parent_label > 0]
    assert len(kids) == 2
    assert {t.start_frame for t in kids} == {1}
    parent_track = [t for t in got if t.label == kids[0].parent_label][0]
    assert parent_track.end_frame == 0


def test_division_area_gate_rejects_fragments():
    """A tiny unmatched fragment must not turn a continuation into a
    division (the round-1 failure mode: watershed fragments triggered 76
    false children)."""
    parent = frame((1, 20, 40, 20, 40))             # 400 px
    # main body wins the 1-to-1 match at IoU 240/400 = 0.6 (<= cap, so the
    # matched-division rule considers it); the fragment overlaps at
    # 48/400 = 0.12 >= 0.1 but is only 12% of the parent's area (< 25%)
    body = frame((1, 20, 32, 20, 40))               # 240 px
    blob(body, 2, 35, 38, 20, 36)                   # 48 px fragment
    got = track_sequence_masks([parent, body])
    kids = [t for t in got if t.parent_label > 0]
    assert kids == []                               # gate rejected the split
    # the continuation must survive as one track plus the fragment track
    assert len(got) == 2
    # with the gate off it would have divided
    ungated = track_sequence_masks(
        [parent, body], cfg=TrackConfig(division_min_child_frac=0.0)
    )
    assert len([t for t in ungated if t.parent_label > 0]) == 2


def test_division_area_gate_classic_path():
    """The unmatched-parent (reference) division path is gated too: a
    half-size daughter plus a tiny fragment is not a division."""
    parent = frame((1, 20, 40, 20, 40))             # 400 px
    # both candidates below the 1-to-1 threshold (IoU < 0.3)
    pieces = frame((2, 20, 28, 20, 33))             # 8x13=104 px, IoU .26
    blob(pieces, 3, 36, 40, 20, 32)                 # 4x12=48 px, IoU 48/400=.12
    got = track_sequence_masks([parent, pieces])
    assert all(t.parent_label == 0 for t in got)
    # gate off -> division accepted (48/400 = 12% < 25%)
    ungated = track_sequence_masks(
        [parent, pieces], cfg=TrackConfig(division_min_child_frac=0.0)
    )
    assert len([t for t in ungated if t.parent_label > 0]) == 2


def test_division_threshold_config():
    # both candidate tests off: IoU threshold impossible, cover disabled
    cfg = TrackConfig(iou_threshold_division=0.9, division_child_cover=0)
    parent = frame((1, 20, 40, 20, 40))
    children = frame((1, 20, 30, 20, 30), (2, 30, 40, 30, 40))
    tracks = track_sequence_masks([parent, children], cfg=cfg)
    assert all(t.parent_label == 0 for t in tracks)


def test_division_child_cover_recovers_low_iou_daughter():
    """A daughter mostly OUTSIDE the parent (IoU below the division
    threshold) still counts via the asymmetric cover test — the real
    missed-division signature (IoU 0.074, cover 0.26 on seq 01)."""
    parent = frame((1, 20, 40, 20, 40))  # 20x20 = 400 px
    # daughter A: top half, strong match; daughter B: 10x10, only 3 of 10
    # columns inside the parent -> IoU 30/(400+100-30) ~ 0.064 < 0.1,
    # cover 30/100 = 0.3 >= 0.25
    children = frame((1, 20, 30, 20, 40), (2, 30, 40, 37, 47))
    tracks = track_sequence_masks([parent, children], cfg=TrackConfig())
    assert sum(t.parent_label > 0 for t in tracks) == 2
    # with cover disabled, the IoU rule alone misses it
    tracks2 = track_sequence_masks(
        [parent, children], cfg=TrackConfig(division_child_cover=0)
    )
    assert sum(t.parent_label > 0 for t in tracks2) == 0


# ----------------------------------------------------------------------- IO
def test_res_track_roundtrip(tmp_path):
    tracks = [CellTrack(1, 0, 5, 0), CellTrack(2, 3, 3, 1)]
    p = str(tmp_path / "res_track.txt")
    write_res_track(p, tracks)
    with open(p) as f:
        assert f.read() == "1 0 5 0\n2 3 3 1\n"
    back = read_track_file(p)
    assert [(t.label, t.start_frame, t.end_frame, t.parent_label) for t in back] == [
        (1, 0, 5, 0), (2, 3, 3, 1)
    ]


def test_res_track_reference_parent_convention(tmp_path):
    p = str(tmp_path / "res_track.txt")
    write_res_track(p, [CellTrack(1, 0, 5, 0)], parent_none=-1)
    with open(p) as f:
        assert f.read() == "1 0 5 -1\n"
    # reader normalizes -1 back to 0
    assert read_track_file(p)[0].parent_label == 0


def test_end_frame_never_below_start(tmp_path):
    p = str(tmp_path / "res_track.txt")
    write_res_track(p, [CellTrack(4, 7, 3, 0)])
    assert read_track_file(p)[0].end_frame == 7
