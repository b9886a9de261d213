"""tools/collect_results.py: headline-row selection and provenance stamping
(the bench.py SEG source of record must never be silently deflated or
falsely re-stamped — advisor round-3 finding + round-8 self-review)."""

import importlib.util
import json
import os

import pytest

SPEC = importlib.util.spec_from_file_location(
    "collect_results",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "collect_results.py"),
)
collect = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(collect)


def _summary(seg01, seg02):
    return {
        "01": {"SEG": seg01, "TRA": 0.95, "DET": 0.96},
        "02": {"SEG": seg02, "TRA": 0.89, "DET": 0.90},
    }


@pytest.fixture
def eval_dir(tmp_path, monkeypatch):
    d = tmp_path / "eval"
    for name, s in {
        "s0": _summary(0.85, 0.80), "s1": _summary(0.86, 0.81),
        "s2": _summary(0.84, 0.82), "ens": _summary(0.80, 0.83),
        "flagship": _summary(0.87, 0.845), "special": _summary(0.88, 0.85),
    }.items():
        (d / name).mkdir(parents=True)
        with open(d / name / "summary.json", "w") as f:
            json.dump(s, f)
    # point the module's repo dir at a sandbox so docs/results_latest.json
    # writes never touch the real record
    repo = tmp_path / "repo"
    (repo / "docs").mkdir(parents=True)
    (repo / "configs").mkdir()
    with open(repo / "configs" / "best_recipe.json", "w") as f:
        f.write("{}")
    monkeypatch.setattr(collect, "REPO", str(repo))
    return str(d), str(repo)


def _latest(repo):
    with open(os.path.join(repo, "docs", "results_latest.json")) as f:
        return json.load(f)


def test_flagship_row_wins_top_level(eval_dir, capsys):
    d, repo = eval_dir
    collect.main(d, update_latest=True)
    latest = _latest(repo)
    # flagship beats both the ens row and the seed means at the top level
    assert latest["seg_seq01"] == 0.87 and latest["seg_seq02"] == 0.845
    assert "flagship" in latest["source"]
    # seed means recorded separately, never at the top level
    assert latest["single_model_3seed_means"]["eval"]["seg_seq01"] == 0.85
    # provenance stamped (headline was refreshed)
    assert latest["eval_date"] and latest["recipe_hash"]


def test_ship_selects_explicit_row(eval_dir):
    d, repo = eval_dir
    collect.main(d, update_latest=True, ship="special",
                 run_dirs=["/ckpt/a", "/ckpt/b"])
    latest = _latest(repo)
    assert latest["seg_seq01"] == 0.88
    assert "special" in latest["source"]
    assert latest["checkpoint_dirs"] == ["/ckpt/a", "/ckpt/b"]


def test_ship_unknown_row_fails(eval_dir):
    d, _ = eval_dir
    with pytest.raises(SystemExit, match="no such eval row"):
        collect.main(d, update_latest=True, ship="nope")


def test_side_experiment_does_not_restamp(eval_dir, tmp_path):
    d, repo = eval_dir
    collect.main(d, update_latest=True)
    before = _latest(repo)
    # a later side-experiment dir with NO flagship/ens/seed rows must not
    # refresh the provenance stamp or the headline numbers
    side = tmp_path / "side"
    (side / "rescue_a0").mkdir(parents=True)
    with open(side / "rescue_a0" / "summary.json", "w") as f:
        json.dump(_summary(0.5, 0.5), f)
    # simulate a recipe edit after the headline eval
    with open(os.path.join(repo, "configs", "best_recipe.json"), "w") as f:
        f.write('{"changed": 1}')
    collect.main(str(side), update_latest=True)
    after = _latest(repo)
    assert after["seg_seq01"] == before["seg_seq01"]
    assert after["source"] == before["source"]
    assert after["recipe_hash"] == before["recipe_hash"]  # not re-stamped


def test_seeds_only_dir_keeps_shipped_headline(eval_dir, tmp_path):
    """A round dir with s0/s1/s2 rows but no flagship/ens row must record
    means under single_model_3seed_means WITHOUT replacing the shipped
    flagship headline or re-stamping provenance (advisor round-4)."""
    d, repo = eval_dir
    collect.main(d, update_latest=True)
    before = _latest(repo)
    seeds = tmp_path / "seeds_only"
    for name, s in {"s0": _summary(0.70, 0.65), "s1": _summary(0.71, 0.66),
                    "s2": _summary(0.72, 0.67)}.items():
        (seeds / name).mkdir(parents=True)
        with open(seeds / name / "summary.json", "w") as f:
            json.dump(s, f)
    with open(os.path.join(repo, "configs", "best_recipe.json"), "w") as f:
        f.write('{"changed": 2}')
    collect.main(str(seeds), update_latest=True)
    after = _latest(repo)
    # headline untouched, provenance not re-stamped
    assert after["seg_seq01"] == before["seg_seq01"] == 0.87
    assert after["source"] == before["source"]
    assert after["recipe_hash"] == before["recipe_hash"]
    # but the seed means ARE recorded under their own key
    assert after["single_model_3seed_means"]["seeds_only"]["seg_seq01"] == 0.71


def test_seeds_only_dir_bootstraps_empty_headline(eval_dir, tmp_path):
    """With NO prior headline, seed means may bootstrap the top level."""
    _, repo = eval_dir
    seeds = tmp_path / "boot"
    for name, s in {"s0": _summary(0.70, 0.65), "s1": _summary(0.71, 0.66)}.items():
        (seeds / name).mkdir(parents=True)
        with open(seeds / name / "summary.json", "w") as f:
            json.dump(s, f)
    collect.main(str(seeds), update_latest=True)
    latest = _latest(repo)
    assert latest["seg_seq01"] == 0.705
    assert "SINGLE-MODEL means" in latest["source"]
