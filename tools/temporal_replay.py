"""Replay the post-network instance chain from archived binary masks (CPU).

The instance masks are a pure function of the predicted binaries:
forward temporal pass -> backward bidi window -> boundary grow -> track.
Replaying that chain from an eval dir's {seq}_RES/mask*.tif lets any
post-processing change be A/B'd against the shipped headline without a
chip (used round 5 to validate the fragment-aware re-split gate fix in
post/temporal.py — the seq-02 frame-51 merge — before re-predicting).

    python tools/temporal_replay.py /root/eval_r8/flagship80 \
        --out /root/eval_r9/replay_fix --grow 1.0 --grow 02=1.5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replay_sequence(eval_dir, seq, out_dir, min_size=1500, bidi_frames=8,
                    grow=0.0):
    from unetseg_tpu.data.io import frame_number, read_image, sorted_frames, \
        write_mask_u16
    from unetseg_tpu.post.boundary import grow_instances
    from unetseg_tpu.post.temporal import refine_backward, \
        temporal_instance_masks

    files = sorted_frames(os.path.join(eval_dir, f"{seq}_RES"), "mask*.tif")
    bins = [read_image(f) > 0 for f in files]
    nums = [frame_number(f) for f in files]
    insts = []
    prev = None
    for b in bins:
        inst = temporal_instance_masks(b, prev, min_size=min_size)
        insts.append(inst)
        prev = inst
    w = bidi_frames + 1
    refined = refine_backward(bins[:w], insts[:w], min_size=min_size,
                              max_frames=bidi_frames)
    insts[:w] = refined
    os.makedirs(out_dir, exist_ok=True)
    for n, inst in zip(nums, insts):
        if grow > 0:
            inst = grow_instances(inst, grow)
        write_mask_u16(os.path.join(out_dir, f"m{n:03d}.tif"), inst)
    return len(insts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_dir")
    ap.add_argument("--data-root", default="/root/data/DIC-C2DH-HeLa")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sequences", nargs="+", default=["01", "02"])
    ap.add_argument("--grow", action="append", default=[],
                    help="radius, or SEQ=radius (repeatable)")
    args = ap.parse_args(argv)

    grows = {}
    default_grow = 0.0
    for g in args.grow:
        if "=" in g:
            k, v = g.split("=")
            grows[k] = float(v)
        else:
            default_grow = float(g)

    from unetseg_tpu.cli.main import main as cli
    from unetseg_tpu.metrics import ctc
    from unetseg_tpu.metrics.divisions import division_report

    summary = {}
    for seq in args.sequences:
        inst_dir = os.path.join(args.out, f"{seq}_INST")
        replay_sequence(args.eval_dir, seq, inst_dir,
                        grow=grows.get(seq, default_grow))
        ctc_dir = os.path.join(args.out, f"{seq}_CTC")
        rc = cli(["track", "--instance-dir", inst_dir, "--ctc-dir", ctc_dir,
                  "--output", os.path.join(args.out, f"{seq}_res_track.txt")])
        if rc:
            raise SystemExit(f"track failed for {seq}")
        gt = os.path.join(args.data_root, f"{seq}_GT")
        s = ctc.seg_measure(os.path.join(gt, "SEG"), ctc_dir)
        r = ctc.tra_measure(os.path.join(gt, "TRA"), ctc_dir)
        rep = division_report(os.path.join(gt, "TRA"), ctc_dir)
        summary[seq] = {
            "SEG": s.value, "TRA": r.tra, "DET": r.det,
            "divisions": f"{rep.matched}/{rep.n_gt}",
        }
        print(seq, json.dumps(summary[seq]), flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
