"""Provenance stamps shared by bench.py and tools/collect_results.py: the
north-star SEG numbers in docs/results_latest.json are recorded evaluations,
not live measurements, so every writer stamps (eval date, recipe hash,
checkpoint dirs) and bench.py surfaces whether the stamp still describes
the shipped recipe and surviving checkpoints."""

import hashlib
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recipe_hash(path: str = "") -> str:
    """Short content hash of configs/best_recipe.json ('' if absent)."""
    path = path or os.path.join(REPO, "configs", "best_recipe.json")
    try:
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        return ""
