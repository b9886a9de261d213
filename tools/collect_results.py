"""Collect round_eval.sh summaries into a results table + results_latest.json.

Usage: python tools/collect_results.py [/root/eval_r5] [--update-latest]

Prints a markdown table of every run's per-sequence SEG/TRA/DET (rows =
eval names: s0/s1/s2/ens/...) with 3-seed means, and with --update-latest
rewrites docs/results_latest.json from the per-seed means (the bench.py SEG
source of record).
"""
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(eval_dir: str, update_latest: bool = False) -> None:
    runs = {}
    for name in sorted(os.listdir(eval_dir)):
        p = os.path.join(eval_dir, name, "summary.json")
        if os.path.isfile(p):
            with open(p) as f:
                runs[name] = json.load(f)
    if not runs:
        raise SystemExit(f"no summaries under {eval_dir}")

    cols = ["01 SEG", "01 TRA", "01 DET", "02 SEG", "02 TRA", "02 DET"]
    print("| run | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))

    def row(name, vals):
        cells = [f"{v:.4f}" if v is not None else "—" for v in vals]
        print(f"| {name} | " + " | ".join(cells) + " |")

    def vals_of(s):
        return [
            s.get("01", {}).get("SEG"), s.get("01", {}).get("TRA"),
            s.get("01", {}).get("DET"), s.get("02", {}).get("SEG"),
            s.get("02", {}).get("TRA"), s.get("02", {}).get("DET"),
        ]

    for name, s in runs.items():
        row(name, vals_of(s))

    seeds = [runs[n] for n in ("s0", "s1", "s2") if n in runs]
    cols_v = [vals_of(s) for s in seeds]
    complete = all(v is not None for c in cols_v for v in c)
    if len(seeds) >= 2 and complete:
        mean = [statistics.mean(c[i] for c in cols_v) for i in range(6)]
        sd = [statistics.pstdev(c[i] for c in cols_v) for i in range(6)]
        print("| seed mean | " + " | ".join(f"{m:.4f}±{s:.4f}"
                                            for m, s in zip(mean, sd)) + " |")
        if update_latest:
            latest = {
                "seg_seq01": round(mean[0], 4),
                "tra_seq01": round(mean[1], 4),
                "seg_seq02": round(mean[3], 4),
                "tra_seq02": round(mean[4], 4),
                "source": f"{len(seeds)}-seed best_recipe means, "
                          f"pipeline eval at {eval_dir}",
                "note": "machine-readable mirror of the latest shipped-recipe "
                        "CTC evaluation; update alongside docs/RESULTS.md",
            }
            if "ens" in runs:
                e = vals_of(runs["ens"])
                latest["ensemble"] = {
                    "seg_seq01": e[0], "tra_seq01": e[1],
                    "seg_seq02": e[3], "tra_seq02": e[4],
                }
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "docs", "results_latest.json",
            )
            with open(path, "w") as f:
                json.dump(latest, f, indent=1)
                f.write("\n")
            print(f"\nwrote {path}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else "/root/eval_r5",
         update_latest="--update-latest" in sys.argv)
