"""CPU-only tracker-threshold sweep over existing instance masks.

VERDICT round-4 item 3: the flagship's tracker thresholds
(`core/config.py` TrackConfig) were tuned on 40-epoch members; the sharper
80-epoch members may want different ones. Tracking + TRA scoring need no
chip: re-track the flagship's shipped `{seq}_RES_INST/m*.tif` instance
masks under each candidate config and re-run the TRA/DET measure
(reference scope: scripts/track.py:21-24 hardcodes its two thresholds).

    python tools/tracker_sweep.py /root/eval_r8/flagship80 \
        --data-root /root/data/DIC-C2DH-HeLa --out /root/eval_r9/tracker_sweep

Writes one JSON line per (config, sequence) to <out>/sweep.jsonl and a
ranked summary to stdout. SEG is invariant under relabeling, so only
TRA/DET are scored.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(eval_dir, data_root, out_dir, seqs, name, flags):
    from unetseg_tpu.cli.main import main as cli_main
    from unetseg_tpu.metrics import ctc

    rows = {}
    for seq in seqs:
        inst = os.path.join(eval_dir, f"{seq}_RES_INST")
        if not os.path.isdir(inst):
            print(f"skip {seq}: no {inst}", file=sys.stderr)
            continue
        ctc_dir = os.path.join(out_dir, name, f"{seq}_CTC")
        rc = cli_main([
            "track", "--instance-dir", inst, "--ctc-dir", ctc_dir,
            "--output", os.path.join(out_dir, name, f"{seq}_res_track.txt"),
            *flags,
        ])
        if rc:
            raise SystemExit(f"track failed for {name} seq {seq}")
        r = ctc.tra_measure(os.path.join(data_root, f"{seq}_GT", "TRA"), ctc_dir)
        rows[seq] = {"TRA": r.tra, "DET": r.det}
        # masks are bulky; keep only the scores
        shutil.rmtree(ctc_dir, ignore_errors=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_dir")
    ap.add_argument("--data-root", default="/root/data/DIC-C2DH-HeLa")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sequences", nargs="+", default=["01", "02"])
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    configs = [("defaults", [])]
    for it in (0.2, 0.25, 0.35, 0.4):
        configs.append((f"iout{it}", ["--iou-track", str(it)]))
    for idiv in (0.05, 0.15, 0.2):
        configs.append((f"idiv{idiv}", ["--iou-division", str(idiv)]))
    for frac in (0.15, 0.35):
        configs.append((f"frac{frac}", ["--min-child-frac", str(frac)]))
    for k in (0, 5):
        configs.append((f"prune{k}", ["--prune-divisions", str(k)]))
    configs.append(("gaps2", ["--close-gaps", "2"]))

    path = os.path.join(args.out, "sweep.jsonl")
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            done = {json.loads(l)["name"] for l in f if l.strip()}
    with open(path, "a") as f:
        for name, flags in configs:
            if name in done:
                continue
            rows = run_config(args.eval_dir, args.data_root, args.out,
                              args.sequences, name, flags)
            rec = {"name": name, "flags": flags, **rows}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec))

    with open(path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    print("\n== ranked by mean TRA ==")
    key = lambda r: sum(r[s]["TRA"] for s in args.sequences if s in r)
    for r in sorted(recs, key=key, reverse=True):
        cells = "  ".join(
            f"{s}: TRA {r[s]['TRA']:.4f} DET {r[s]['DET']:.4f}"
            for s in args.sequences if s in r
        )
        print(f"{r['name']:>10}  {cells}")


if __name__ == "__main__":
    main()
