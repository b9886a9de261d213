"""Tracklet gap-closing and division-pruning unit tests."""

import numpy as np

from unetseg_tpu.track.postprocess import close_gaps, prune_short_divisions
from unetseg_tpu.track.tracker import Tracker


def frame(*blobs, shape=(48, 48)):
    m = np.zeros(shape, np.uint16)
    for label, y0, y1, x0, x1 in blobs:
        m[y0:y1, x0:x1] = label
    return m


def _run(masks, frame_nums=None, **kw):
    nums = list(frame_nums or range(len(masks)))
    tr = Tracker()
    for m, n in zip(masks, nums):
        tr.update(m, n)
    return close_gaps(masks, nums, tr.tracks(), tr.assignments(), **kw)


def test_one_frame_gap_closed():
    cell = (1, 10, 20, 10, 20)
    masks = [frame(cell), frame(), frame(cell), frame(cell)]
    tracks, assignments = _run(masks, max_gap=2)
    assert len(tracks) == 1
    t = tracks[0]
    assert (t.start_frame, t.end_frame) == (0, 3)
    # assignments remap the second fragment to the surviving id
    assert assignments[2] == {1: t.label}


def test_gap_beyond_max_not_closed():
    cell = (1, 10, 20, 10, 20)
    masks = [frame(cell), frame(), frame(), frame(), frame(cell)]
    tracks, _ = _run(masks, max_gap=2)
    assert len(tracks) == 2


def test_no_link_without_overlap():
    masks = [frame((1, 0, 8, 0, 8)), frame(), frame((1, 30, 40, 30, 40))]
    tracks, _ = _run(masks, max_gap=2)
    assert len(tracks) == 2


def test_divided_parent_not_gap_linked():
    """A track that ended in a division keeps its children; no stitching."""
    parent = frame((1, 20, 40, 20, 40))
    children = frame((1, 20, 30, 20, 30), (2, 30, 40, 30, 40))
    masks = [parent, children, children]
    tracks, _ = _run(masks, max_gap=2)
    parents = [t for t in tracks if t.parent_label > 0]
    assert len(parents) == 2  # division intact
    assert len(tracks) == 3


def _run_prune(masks, frame_nums=None, **kw):
    nums = list(frame_nums or range(len(masks)))
    tr = Tracker()
    for m, n in zip(masks, nums):
        tr.update(m, n)
    return prune_short_divisions(masks, nums, tr.tracks(), tr.assignments(), **kw)


def test_prune_revokes_one_frame_daughter():
    parent = frame((1, 20, 40, 20, 40))
    both = frame((1, 20, 30, 20, 40), (2, 30, 40, 20, 40))
    only1 = frame((1, 20, 30, 20, 40))
    masks = [parent, both, only1, only1, only1]
    tracks, assignments = _run_prune(masks, min_child_frames=3)
    # daughter 2 lived one frame -> division revoked: the surviving daughter
    # merges back into the parent; the fragment becomes parentless
    assert all(t.parent_label == 0 for t in tracks)
    long_tracks = [t for t in tracks if t.end_frame == 4]
    assert len(long_tracks) == 1
    assert long_tracks[0].start_frame == 0
    # assignments now map the continuing object to the parent's id
    assert assignments[4][1] == long_tracks[0].label


def test_prune_keeps_persistent_division():
    parent = frame((1, 20, 40, 20, 40))
    both = frame((1, 20, 30, 20, 40), (2, 30, 40, 20, 40))
    masks = [parent, both, both, both]
    tracks, _ = _run_prune(masks, min_child_frames=3)
    assert len([t for t in tracks if t.parent_label > 0]) == 2


def test_prune_spares_sequence_end_censoring():
    """A daughter that runs to the last frame is censored, not short."""
    parent = frame((1, 20, 40, 20, 40))
    both = frame((1, 20, 30, 20, 40), (2, 30, 40, 20, 40))
    masks = [parent, both, both]  # daughters live 2 frames, to the end
    tracks, _ = _run_prune(masks, min_child_frames=3)
    assert len([t for t in tracks if t.parent_label > 0]) == 2


def test_chained_merges_resolve():
    """gap semantics: start_frame == end_frame + gap, so one empty frame
    between appearances is gap=2."""
    cell = (1, 10, 20, 10, 20)
    masks = [frame(cell), frame(), frame(cell), frame(), frame(cell)]
    tracks, assignments = _run(masks, max_gap=2)
    assert len(tracks) == 1
    assert tracks[0].end_frame == 4
    tid = tracks[0].label
    assert all(a.get(1) in (None, tid) for a in assignments)
