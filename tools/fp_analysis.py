"""Characterize the residual CTC error budget: WHO are the FP and NS ops?

Recomputes the per-frame TRA majority matching (same math as
metrics/ctc._tra_py, golden-tested against the official measures) and dumps
every FP vertex (result instance matched by no GT marker) and NS vertex
(result instance covering >=2 GT markers) with the evidence needed to pick
a gate:

- area, bbox, min distance to the frame edge;
- the owning track's lifetime (1-frame tracks are debris candidates);
- overlap with the SILVER-truth full masks (ST/SEG) when present — a
  TRA-FP that sits on a silver-truth cell is a real unannotated cell, not
  debris, and no gate should remove it.

Usage:
  python tools/fp_analysis.py <gt_tra_dir> <res_dir> [st_seg_dir]

reference: scripts/predict.py:47 (MIN_CELL_SIZE=15) is the reference's only
FP control; this tool informs a smarter one (VERDICT round-2 item 6).
"""
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from unetseg_tpu.data.io import frame_number, read_image, sorted_frames
from unetseg_tpu.metrics.ctc import _frame_overlap, _majority_match_py
from unetseg_tpu.metrics.divisions import read_track_file


def _edge_distance(mask: np.ndarray) -> int:
    ys, xs = np.nonzero(mask)
    h, w = mask.shape
    return int(min(ys.min(), xs.min(), h - 1 - ys.max(), w - 1 - xs.max()))


def main(gt_tra_dir: str, res_dir: str, st_seg_dir: str = None) -> None:
    gt_files = {frame_number(f): f
                for f in sorted_frames(gt_tra_dir, "man_track*.tif")}
    res_files = {frame_number(f): f
                 for f in sorted_frames(res_dir, "mask*.tif")}
    st_files = {}
    if st_seg_dir and os.path.isdir(st_seg_dir):
        st_files = {frame_number(f): f
                    for f in sorted_frames(st_seg_dir, "man_seg*.tif")}
    rows = read_track_file(os.path.join(res_dir, "res_track.txt"))
    span = {lab: (b, e) for lab, b, e, _p in rows}

    fps, nss = [], []
    area_hist = defaultdict(int)
    for f in sorted(set(gt_files) & set(res_files)):
        g = read_image(gt_files[f])
        r = read_image(res_files[f])
        joint = _frame_overlap(g, r)
        match = _majority_match_py(joint)
        k = defaultdict(list)
        for gl, rl in match.items():
            k[rl].append(gl)
        res_labels = [l for l in range(1, joint.shape[1])
                      if joint.sum(axis=0)[l] > 0]
        st = read_image(st_files[f]) if f in st_files else None
        for rl in res_labels:
            inst = r == rl
            area = int(inst.sum())
            rec = {
                "frame": f, "label": int(rl), "area": area,
                "edge_dist": _edge_distance(inst),
                "track_span": span.get(rl),
                "track_len": (span[rl][1] - span[rl][0] + 1)
                if rl in span else None,
            }
            if st is not None:
                st_labs, st_counts = np.unique(st[inst], return_counts=True)
                on_st = int(st_counts[st_labs > 0].sum())
                rec["silver_cover_frac"] = round(on_st / max(area, 1), 3)
            if rl not in k:
                fps.append(rec)
                area_hist[min(area // 250 * 250, 3000)] += 1
            elif len(k[rl]) > 1:
                rec["gt_markers"] = [int(x) for x in k[rl]]
                nss.append(rec)

    print(f"FP vertices: {len(fps)}   NS vertices: {len(nss)}")
    print("\nFP area histogram (250-px bins, 3000+ pooled):")
    for b in sorted(area_hist):
        print(f"  {b:5d}+ : {area_hist[b]}")
    one_frame = [x for x in fps if x["track_len"] == 1]
    edge = [x for x in fps if x["edge_dist"] <= 5]
    print(f"\nFP on 1-frame tracks: {len(one_frame)}   "
          f"FP touching the frame edge (<=5 px): {len(edge)}")
    if any("silver_cover_frac" in x for x in fps):
        real = [x for x in fps if x.get("silver_cover_frac", 0) > 0.5]
        print(f"FP sitting >50% on a silver-truth cell (real unannotated "
              f"cells — do NOT gate these): {len(real)} / {len(fps)}")
    print("\nfirst 25 FPs:")
    for x in fps[:25]:
        print("  " + json.dumps(x))
    print("\nall NS:")
    for x in nss[:40]:
        print("  " + json.dumps(x))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
