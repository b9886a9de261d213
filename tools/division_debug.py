"""Root-cause a MISSED GT division: what did the pipeline see at that frame?

For each GT division event not matched by metrics/divisions.division_report,
dump the local evidence across frames [te-tol, te+tol+1]:

- which result instances overlap the GT parent's final marker and each
  child's first marker (label, area, track id, parent in res_track);
- whether the daughters were ever SEGMENTED as separate instances (if not,
  the miss is an instance-segmentation under-split, not a tracker failure);
- the parent->candidate-daughter IoUs the tracker would have scored,
  recomputed from the result masks (track/iou joint histogram), against the
  division threshold/area-gate settings.

Usage:
  python tools/division_debug.py <gt_tra_dir> <res_dir> [tol]

reference: scripts/track.py:198-243 is the division rule being debugged;
the GT lineage is man_track.txt (CTC convention L B E P).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from unetseg_tpu.data.io import read_image
from unetseg_tpu.metrics.divisions import (
    _frames_by_number,
    division_report,
    divisions_of,
    read_track_file,
)


def overlapping_instances(mask: np.ndarray, marker: np.ndarray):
    """[(label, pixels-of-marker-covered, label-area), ...] desc by cover."""
    labs, counts = np.unique(mask[marker], return_counts=True)
    out = []
    for lab, c in zip(labs, counts):
        if lab == 0:
            continue
        out.append((int(lab), int(c), int((mask == lab).sum())))
    out.sort(key=lambda t: -t[1])
    return out


def pair_iou(mask_a: np.ndarray, la: int, mask_b: np.ndarray, lb: int) -> float:
    a = mask_a == la
    b = mask_b == lb
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / union if union else 0.0


def main(gt_tra_dir: str, res_dir: str, tol: int = 2) -> None:
    rep = division_report(gt_tra_dir, res_dir, frame_tolerance=tol)
    print(f"divisions: {rep.matched}/{rep.n_gt} matched "
          f"({rep.n_res} result divisions)")
    gt_rows = read_track_file(os.path.join(gt_tra_dir, "man_track.txt"))
    res_rows = read_track_file(os.path.join(res_dir, "res_track.txt"))
    gt_divs = divisions_of(gt_rows)
    gt_begin = {lab: b for lab, b, _e, _p in gt_rows}
    res_parent = {lab: p for lab, _b, _e, p in res_rows}
    res_span = {lab: (b, e) for lab, b, e, _p in res_rows}
    gt_frames = _frames_by_number(gt_tra_dir, "man_track*.tif")
    res_frames = _frames_by_number(res_dir, "mask*.tif")

    for d in rep.details:
        if d["res_parent"] is not None:
            continue
        gpar, te = d["gt_parent"], d["gt_frame"]
        children = gt_divs[gpar]
        print(f"\n=== MISSED division: GT parent {gpar} ends frame {te}, "
              f"children {children} ===")
        if te not in gt_frames:
            print("  (no GT marker frame)")
            continue
        gmask_par = read_image(gt_frames[te]) == gpar
        print(f"  GT parent marker area {int(gmask_par.sum())}")
        # what covers the parent marker in the result, around te
        for t in range(te - tol, te + tol + 2):
            if t not in res_frames:
                continue
            rmask = read_image(res_frames[t])
            cover = overlapping_instances(rmask, gmask_par)
            rows = [
                {"label": lab, "marker_cover": c, "area": a,
                 "parent": res_parent.get(lab), "span": res_span.get(lab)}
                for lab, c, a in cover[:4]
            ]
            print(f"  frame {t}: parent-marker covered by {json.dumps(rows)}")
        # are the daughters separate instances at their first GT frames?
        t1 = te + 1
        for ch in children:
            tb = gt_begin.get(ch, t1)
            if tb not in gt_frames or tb not in res_frames:
                continue
            gm = read_image(gt_frames[tb]) == ch
            rmask = read_image(res_frames[tb])
            cover = overlapping_instances(rmask, gm)
            rows = [
                {"label": lab, "marker_cover": c, "area": a,
                 "parent": res_parent.get(lab)}
                for lab, c, a in cover[:3]
            ]
            print(f"  GT child {ch} @ frame {tb} (marker {int(gm.sum())} px) "
                  f"covered by {json.dumps(rows)}")
        # tracker-eye view: parent-frame instance vs next-frame candidates
        if te in res_frames and te + 1 in res_frames:
            rm0 = read_image(res_frames[te])
            rm1 = read_image(res_frames[te + 1])
            cover0 = overlapping_instances(rm0, gmask_par)
            if cover0:
                par_lab = cover0[0][0]
                par_area = cover0[0][2]
                cands = []
                pm = rm0 == par_lab
                for lab in np.unique(rm1[pm]):
                    if lab == 0:
                        continue
                    cands.append({
                        "label": int(lab),
                        "iou_vs_parent": round(pair_iou(rm0, par_lab, rm1, int(lab)), 3),
                        "area": int((rm1 == lab).sum()),
                        "area_frac_of_parent": round(
                            float((rm1 == lab).sum()) / max(par_area, 1), 3),
                        "parent_in_res": res_parent.get(int(lab)),
                    })
                print(f"  tracker view: res parent {par_lab} (area {par_area}) "
                      f"-> frame {te + 1} candidates {json.dumps(cands)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
