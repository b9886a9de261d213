"""Track post-processing: gap closing.

The greedy frame-to-frame matcher fragments lineages whenever segmentation
drops a cell for a frame or two (the reference's output is the extreme case:
10,807 mostly single-frame tracks). Gap closing links a track that ends at
frame t to a parentless track that starts at t+1..t+max_gap whose first
object overlaps the ended track's last object — a standard tracklet-stitching
pass the reference lacks entirely.

Works on the tracker's outputs (tracks + per-frame label->track assignments)
plus the instance masks, and returns updated tracks/assignments with merged
ids, ready for `relabel_by_track`.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, List, Sequence, Tuple

import numpy as np

from unetseg_tpu.track.iou import pairwise_iou
from unetseg_tpu.track.tracker import CellTrack


def close_gaps(
    masks: Sequence[np.ndarray],
    frame_nums: Sequence[int],
    tracks: List[CellTrack],
    assignments: List[Dict[int, int]],
    max_gap: int = 2,
    iou_threshold: float = 0.2,
) -> Tuple[List[CellTrack], List[Dict[int, int]]]:
    """Link (ended track) -> (later-starting parentless track) pairs.

    Greedy, highest IoU first, each endpoint used once. The child track's
    vertices are relabeled to the parent id; its own children re-parent.
    """
    frame_index = {f: i for i, f in enumerate(frame_nums)}
    by_id = {t.label: t for t in tracks}
    has_children = {t.parent_label for t in tracks if t.parent_label > 0}

    # object pixel label of track `tid` in a given frame
    label_in_frame: Dict[Tuple[int, int], int] = {}
    for idx, assignment in enumerate(assignments):
        for lab, tid in assignment.items():
            label_in_frame[(idx, tid)] = lab

    candidates = []
    ends = [t for t in tracks if t.label not in has_children]
    starts_by_frame: Dict[int, List[CellTrack]] = {}
    for t in tracks:
        if t.parent_label == 0:
            starts_by_frame.setdefault(t.start_frame, []).append(t)

    for a in ends:
        end_idx = frame_index.get(a.end_frame)
        if end_idx is None:
            continue
        a_lab = label_in_frame.get((end_idx, a.label))
        if a_lab is None:
            continue
        for gap in range(1, max_gap + 1):
            sf = a.end_frame + gap
            for b in starts_by_frame.get(sf, []):
                if b.label == a.label:
                    continue
                s_idx = frame_index.get(sf)
                if s_idx is None:
                    continue
                b_lab = label_in_frame.get((s_idx, b.label))
                if b_lab is None:
                    continue
                iou_m, pl, cl = pairwise_iou(
                    (np.asarray(masks[end_idx]) == a_lab).astype(np.uint16),
                    (np.asarray(masks[s_idx]) == b_lab).astype(np.uint16),
                )
                if iou_m.size and iou_m[0, 0] >= iou_threshold:
                    candidates.append((float(iou_m[0, 0]), a.label, b.label))

    candidates.sort(reverse=True)
    used_ends: set = set()
    used_starts: set = set()
    merge_into: Dict[int, int] = {}  # child track id -> surviving id
    for iou_v, a_id, b_id in candidates:
        # follow prior merges of the end side
        while a_id in merge_into:
            a_id = merge_into[a_id]
        if a_id in used_ends or b_id in used_starts or a_id == b_id:
            continue
        a, b = by_id[a_id], by_id[b_id]
        if b.start_frame <= a.end_frame:
            continue
        merge_into[b_id] = a_id
        used_ends.add(a_id)
        used_starts.add(b_id)
        by_id[a_id] = replace(a, end_frame=b.end_frame)

    def resolve(tid: int) -> int:
        while tid in merge_into:
            tid = merge_into[tid]
        return tid

    new_tracks = []
    for t in tracks:
        if t.label in merge_into:
            continue
        t = by_id[t.label]
        parent = resolve(t.parent_label) if t.parent_label > 0 else 0
        new_tracks.append(replace(t, parent_label=parent))
    new_assignments = [
        {lab: resolve(tid) for lab, tid in a.items()} for a in assignments
    ]
    return new_tracks, new_assignments
