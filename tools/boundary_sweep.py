"""Morphological boundary refinement sweep on existing instance masks.

VERDICT-r4 item 6: seq-02's residual SEG loss is boundary quality on found
cells, not FN/FP (round-7 error budget). The vote merges (member-vote x
flip-vote) erode membranes — a cell's boundary ring only survives where a
majority of members/flips agree, which systematically shrinks instances.
This sweeps a post-hoc grow-into-background: every background pixel within
`k` px of foreground adopts its nearest instance's label (cells never grow
into each other — the membrane between touching cells stays put, which is
what keeps this from undoing the vote's separation win), then re-measures
SEG per sequence straight from the masks (CPU-only, no chip).

    python tools/boundary_sweep.py /root/eval_r8/flagship80 \
        --out /root/eval_r9/boundary_sweep
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from unetseg_tpu.post.boundary import grow_instances  # single source


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_dir")
    ap.add_argument("--data-root", default="/root/data/DIC-C2DH-HeLa")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sequences", nargs="+", default=["01", "02"])
    ap.add_argument("--grow", nargs="+", type=float,
                    default=[1.0, 1.5, 2.0, 3.0])
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    from unetseg_tpu.data.io import (
        frame_number, read_image, sorted_frames, write_mask_u16,
    )
    from unetseg_tpu.metrics import ctc

    results = []
    for seq in args.sequences:
        inst_dir = os.path.join(args.eval_dir, f"{seq}_RES_INST")
        files = [f for f in sorted_frames(inst_dir, "m*.tif")
                 if not os.path.basename(f).startswith("mask")]
        gt_seg = os.path.join(args.data_root, f"{seq}_GT", "SEG")
        masks = [read_image(f) for f in files]
        nums = [frame_number(f) for f in files]
        for k in [0.0] + args.grow:
            d = os.path.join(args.out, f"{seq}_grow{k}")
            os.makedirs(d, exist_ok=True)
            for n, m in zip(nums, masks):
                p = os.path.join(d, f"mask{n:03d}.tif")
                if not os.path.exists(p):
                    write_mask_u16(p, grow_instances(m, k))
            r = ctc.seg_measure(gt_seg, d)
            rec = {"seq": seq, "grow": k, "SEG": r.value}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\nbest per sequence:")
    for seq in args.sequences:
        rows = [r for r in results if r["seq"] == seq]
        best = max(rows, key=lambda r: r["SEG"])
        base = next(r for r in rows if r["grow"] == 0)
        print(f"  {seq}: grow={best['grow']} SEG {best['SEG']:.4f} "
              f"(baseline {base['SEG']:.4f}, delta {best['SEG']-base['SEG']:+.4f})")


if __name__ == "__main__":
    main()
