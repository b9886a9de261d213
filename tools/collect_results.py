"""Collect round_eval.sh summaries into a results table + results_latest.json.

Usage: python tools/collect_results.py [/root/eval_r5] [--update-latest]
           [--run-dirs /root/run_r8/s0,/root/run_r8/s1,...]

Prints a markdown table of every run's per-sequence SEG/TRA/DET (rows =
eval names: s0/s1/s2/ens/flagship/...) with 3-seed means. With
--update-latest it rewrites docs/results_latest.json (the bench.py SEG
source of record): the TOP-LEVEL seg/tra keys always carry the SHIPPED
config's row — "flagship" if present, else "ens" — so a routine refresh can
never silently replace the flagship ensemble numbers with single-model seed
means (the single-model means are recorded separately, keyed by eval dir).
Also stamps provenance (eval date, recipe hash, checkpoint dirs) that
bench.py surfaces so a stale number is visible to the driver.
"""
import json
import os
import statistics
import sys
from datetime import date

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(eval_dir: str, update_latest: bool = False, run_dirs=None,
         ship: str = "") -> None:
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
    mean = sd = None
    if len(seeds) >= 2 and complete:
        mean = [statistics.mean(c[i] for c in cols_v) for i in range(6)]
        sd = [statistics.pstdev(c[i] for c in cols_v) for i in range(6)]
        print("| seed mean | " + " | ".join(f"{m:.4f}±{s:.4f}"
                                            for m, s in zip(mean, sd)) + " |")

    if not update_latest:
        return

    path = os.path.join(REPO, "docs", "results_latest.json")
    latest = {}
    if os.path.isfile(path):
        with open(path) as f:
            latest = json.load(f)

    round_key = os.path.basename(os.path.normpath(eval_dir))
    if mean is not None:
        smm = latest.get("single_model_3seed_means") or {}
        smm[round_key] = {
            "seg_seq01": round(mean[0], 4), "tra_seq01": round(mean[1], 4),
            "seg_seq02": round(mean[3], 4), "tra_seq02": round(mean[4], 4),
            "spread_seg_seq02": round(sd[3], 4),
        }
        latest["single_model_3seed_means"] = smm

    # the top-level keys bench.py reads == the SHIPPED config's numbers;
    # --ship picks the row explicitly (e.g. a flagship re-eval row over
    # surviving checkpoints), else flagship/ens auto-resolve
    if ship and ship not in runs:
        raise SystemExit(f"--ship {ship}: no such eval row under {eval_dir}")
    shipped = ship or next((n for n in ("flagship", "ens") if n in runs), None)
    # seeds-only collections may BOOTSTRAP a headline but never replace an
    # existing one: overwriting the shipped flagship numbers with lower
    # single-model means (and re-stamping provenance) requires an explicit
    # --ship row (advisor round-4 finding)
    headline_exists = "seg_seq01" in latest
    top_updated = shipped is not None or (mean is not None and not headline_exists)
    if shipped is not None:
        v = vals_of(runs[shipped])
        latest.update({
            "seg_seq01": v[0], "tra_seq01": v[1],
            "seg_seq02": v[3], "tra_seq02": v[4],
            "source": (
                f"shipped config (configs/best_recipe.json): '{shipped}' "
                f"eval row, pipeline eval at {eval_dir}"
            ),
        })
    elif mean is not None and not headline_exists:
        latest.update({
            "seg_seq01": round(mean[0], 4), "tra_seq01": round(mean[1], 4),
            "seg_seq02": round(mean[3], 4), "tra_seq02": round(mean[4], 4),
            "source": (
                f"{len(seeds)}-seed best_recipe SINGLE-MODEL means (no "
                f"flagship/ens row under {eval_dir}) — below the shipped "
                f"ensemble config's numbers"
            ),
        })
    if "ens" in runs:
        e = vals_of(runs["ens"])
        latest["ensemble"] = {
            "seg_seq01": e[0], "tra_seq01": e[1],
            "seg_seq02": e[3], "tra_seq02": e[4],
        }

    if top_updated:
        # stamp ONLY when the headline numbers were refreshed — re-stamping
        # on a side-experiment collection would mark stale numbers current
        from unetseg_tpu.utils.provenance import recipe_hash

        latest["eval_date"] = date.today().isoformat()
        latest["recipe_hash"] = recipe_hash()
        if run_dirs:
            latest["checkpoint_dirs"] = run_dirs
    latest["note"] = (
        "machine-readable mirror of the latest shipped-recipe CTC "
        "evaluation; update alongside docs/RESULTS.md"
    )
    with open(path, "w") as f:
        json.dump(latest, f, indent=1)
        f.write("\n")
    print(f"\nwrote {path}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("eval_dir", nargs="?", default="/root/eval_r5")
    ap.add_argument("--update-latest", action="store_true")
    ap.add_argument("--run-dirs", default=None,
                    help="comma-separated checkpoint dirs recorded as "
                         "provenance in results_latest.json")
    ap.add_argument("--ship", default="",
                    help="eval row to publish as the top-level numbers")
    a = ap.parse_args()
    main(a.eval_dir, update_latest=a.update_latest,
         run_dirs=[d for d in (a.run_dirs or "").split(",") if d] or None,
         ship=a.ship)
