"""Division recall/precision vs GT lineage (metrics/divisions.py)."""

import os

import numpy as np

from unetseg_tpu.data.io import write_mask_u16
from unetseg_tpu.metrics.divisions import (
    division_report,
    divisions_of,
    read_track_file,
)


def _stage(tmp_path):
    gt = tmp_path / "GT_TRA"
    res = tmp_path / "RES"
    gt.mkdir()
    res.mkdir()
    # GT: track 1 divides at frame 1 into 2, 3; track 9 never divides
    (gt / "man_track.txt").write_text(
        "1 0 1 0\n2 2 3 1\n3 2 3 1\n9 0 3 0\n"
    )
    # RES: track 5 divides at frame 1 into 6, 7 (matches); track 8 fake-
    # divides somewhere unrelated
    (res / "res_track.txt").write_text(
        "5 0 1 0\n6 2 3 5\n7 2 3 5\n8 0 1 0\n10 2 3 8\n11 2 3 8\n"
    )
    for t in range(4):
        g = np.zeros((32, 32), np.uint16)
        r = np.zeros((32, 32), np.uint16)
        if t <= 1:
            g[8:12, 8:12] = 1          # GT parent marker
            r[6:14, 6:14] = 5          # RES parent covers it
            r[24:28, 2:6] = 8          # unrelated fake parent
        else:
            g[4:8, 4:8] = 2
            g[12:16, 12:16] = 3
            r[4:8, 4:8] = 6
            r[12:16, 12:16] = 7
        g[20:24, 20:24] = 9
        write_mask_u16(str(gt / f"man_track{t:03d}.tif"), g)
        write_mask_u16(str(res / f"mask{t:03d}.tif"), r)
    return str(gt), str(res)


def test_divisions_of():
    divs = divisions_of([(1, 0, 1, 0), (2, 2, 3, 1), (3, 2, 3, 1), (4, 0, 3, 0)])
    assert divs == {1: [2, 3]}


def test_division_report_matches(tmp_path):
    gt, res = _stage(tmp_path)
    r = division_report(gt, res)
    assert r.n_gt == 1 and r.n_res == 2
    assert r.matched == 1
    assert r.recall == 1.0 and r.precision == 0.5
    assert r.details[0]["res_parent"] == 5


def test_division_report_no_match_when_far(tmp_path):
    gt, res = _stage(tmp_path)
    r = division_report(gt, res, frame_tolerance=0, marker_containment=0.99)
    # containment holds (marker fully inside), so tolerance 0 still matches
    assert r.matched == 1


def test_cli_subcommand(tmp_path, capsys):
    import json

    from unetseg_tpu.cli.main import main

    gt, res = _stage(tmp_path)
    assert main(["evaluate-divisions", "--gt-dir", gt, "--res-dir", res]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["matched"] == 1 and out["gt_divisions"] == 1
