"""CLI tests: drive the real subcommands end-to-end on a tiny synthetic
dataset (tiny model sizes so the whole workflow runs on the CPU CI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from unetseg_tpu.cli.main import main

SIZE = 188


@pytest.fixture
def tree(tmp_path):
    root = tmp_path / "HeLa"
    (root / "01").mkdir(parents=True)
    (root / "01_ST" / "SEG").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rs.rand(SIZE, SIZE) * 255).astype(np.uint8)).save(
            root / "01" / f"t{i:03d}.tif"
        )
        m = np.zeros((SIZE, SIZE), np.uint16)
        m[40:90, 40:90] = 1
        m[120:160, 100:150] = 2
        Image.fromarray(m).save(root / "01_ST" / "SEG" / f"man_seg{i:03d}.tif")
    return root


def test_help_lists_subcommands(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for cmd in ["preprocess", "train", "infer", "predict", "track",
                "evaluate", "evaluate-ctc", "visualize", "bench"]:
        assert cmd in out


def test_preprocess_writes_and_skips(tree, capsys):
    rc = main(["preprocess", "--data-root", str(tree), "--sequence", "01"])
    assert rc == 0
    wm_dir = tree / "01_ST" / "WEIGHT_MAPS"
    assert sorted(os.listdir(wm_dir)) == [
        f"weight_map_{i:03d}.npy" for i in range(4)
    ]
    # idempotent: second run skips
    rc = main(["preprocess", "--data-root", str(tree), "--sequence", "01"])
    assert rc == 0
    assert "4 already existed" in capsys.readouterr().out
    wm = np.load(wm_dir / "weight_map_000.npy")
    assert wm.shape == (SIZE, SIZE)


def test_preprocess_paper_mode(tree):
    rc = main([
        "preprocess", "--data-root", str(tree), "--sequence", "01",
        "--mode", "paper", "--force",
    ])
    assert rc == 0


def test_track_cli(tmp_path, capsys):
    inst_dir = tmp_path / "01_RES_INST"
    inst_dir.mkdir()
    for i in range(3):
        m = np.zeros((64, 64), np.uint16)
        m[10 + i : 20 + i, 10:20] = 1
        Image.fromarray(m).save(inst_dir / f"m{i:03d}.tif")
    out = str(tmp_path / "res_track.txt")
    rc = main(["track", "--instance-dir", str(inst_dir), "--output", out])
    assert rc == 0
    with open(out) as f:
        assert f.read() == "1 0 2 0\n"


def test_evaluate_ctc_cli(capsys):
    ref = "/root/reference/EvaluationSoftware/testing_dataset"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    rc = main([
        "evaluate-ctc", "seg",
        "--gt-dir", os.path.join(ref, "01_GT", "SEG"),
        "--res-dir", os.path.join(ref, "01_RES"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert abs(out["SEG"] - 0.232874) < 5e-7


def test_visualize_cli(tree, tmp_path):
    inst_dir = tmp_path / "inst"
    inst_dir.mkdir()
    for i in range(2):
        m = np.zeros((SIZE, SIZE), np.uint16)
        m[40:90, 40:90] = 1
        Image.fromarray(m).save(inst_dir / f"m{i:03d}.tif")
    out_dir = str(tmp_path / "vis")
    rc = main([
        "visualize", "--instance-dir", str(inst_dir),
        "--images-dir", str(tree / "01"), "--output-dir", out_dir, "--tracks",
    ])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["vis_frame_000.png", "vis_frame_001.png"]


@pytest.mark.slow
def test_pipeline_command(tree, tmp_path, capsys):
    """`pipeline` = the whole workflow in one command, incl. CTC scoring
    against staged GT dirs."""
    from unetseg_tpu.core.config import (
        Config,
        DataConfig,
        InferConfig,
        ModelConfig,
        TrainConfig,
    )

    cfg_file = str(tmp_path / "cfg.json")
    cfg = Config(
        model=ModelConfig(compute_dtype="float32", base_features=4),
        data=DataConfig(image_size=SIZE, augment=False, val_percent=0.3),
        train=TrainConfig(num_epochs=1, batch_size=2),
        # keep everything at the tiny geometry AND resize predictions back
        # to GT resolution so the CTC measures can score them
        infer=InferConfig(image_size=SIZE, min_cell_size=1),
    )
    with open(cfg_file, "w") as f:
        f.write(cfg.to_json())
    # stage GT dirs (reuse the silver masks; man_track = per-frame masks +
    # a minimal man_track.txt so TRA runs)
    (tree / "01_GT" / "SEG").mkdir(parents=True)
    (tree / "01_GT" / "TRA").mkdir(parents=True)
    for i in range(4):
        os.link(
            str(tree / "01_ST" / "SEG" / f"man_seg{i:03d}.tif"),
            str(tree / "01_GT" / "SEG" / f"man_seg{i:03d}.tif"),
        )
        os.link(
            str(tree / "01_ST" / "SEG" / f"man_seg{i:03d}.tif"),
            str(tree / "01_GT" / "TRA" / f"man_track{i:03d}.tif"),
        )
    with open(tree / "01_GT" / "TRA" / "man_track.txt", "w") as f:
        f.write("1 0 3 0\n2 0 3 0\n")
    out = str(tmp_path / "pipe")
    capsys.readouterr()
    assert main([
        "pipeline", "--config", cfg_file, "--data-root", str(tree),
        "--sequences", "01", "--output-dir", out, "--no-tiled",
        "--resize-output", str(SIZE),
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    row = summary["pipeline"]["01"]
    assert "SEG" in row and 0.0 <= row["SEG"] <= 1.0
    assert "TRA" in row and 0.0 <= row["TRA"] <= 1.0
    assert os.path.exists(os.path.join(out, "01_CTC", "res_track.txt"))


@pytest.mark.slow
def test_full_workflow_train_predict_track(tree, tmp_path, capsys):
    """The reference README's 8-step workflow end-to-end on a tiny net."""
    ckpt = str(tmp_path / "ckpts")
    assert main(["preprocess", "--data-root", str(tree), "--sequence", "01"]) == 0
    # tiny net via config file
    cfg_file = str(tmp_path / "cfg.json")
    from unetseg_tpu.core.config import Config, InferConfig, ModelConfig

    cfg = Config(
        model=ModelConfig(compute_dtype="float32", base_features=4),
        infer=InferConfig(image_size=SIZE),
    )
    with open(cfg_file, "w") as f:
        f.write(cfg.to_json())
    assert main([
        "train", "--config", cfg_file, "--data-root", str(tree),
        "--epochs", "1", "--batch-size", "2", "--checkpoint-dir", ckpt,
        "--max-steps", "2", "--no-augment",
    ]) == 0
    out_dir = str(tmp_path / "pred")
    assert main([
        "predict", "--config", cfg_file, "--checkpoint-dir", ckpt,
        "--data-root", str(tree), "--sequence", "01",
        "--output-dir", out_dir, "--min-cell-size", "1",
    ]) == 0
    inst_dir = os.path.join(out_dir, "01_RES_INST")
    assert len(os.listdir(inst_dir)) == 4
    assert main(["track", "--instance-dir", inst_dir]) == 0
    assert os.path.exists(os.path.join(out_dir, "res_track.txt"))

    # pooled evaluation protocol (reference: scripts/evaluate.py:54-82):
    # stage a second sequence, pool 01+02, score one split of the pool
    (tree / "02").mkdir()
    (tree / "02_ST" / "SEG").mkdir(parents=True)
    for i in range(4):
        for sub in ["", "_ST/SEG"]:
            src = "01" + sub
            dst = "02" + sub
            name = f"t{i:03d}.tif" if not sub else f"man_seg{i:03d}.tif"
            os.link(str(tree / src / name), str(tree / dst / name))
    capsys.readouterr()
    assert main([
        "evaluate", "--config", cfg_file, "--checkpoint-dir", ckpt,
        "--data-root", str(tree), "--sequences", "01", "02",
        "--pooled", "--val-only", "--val-percent", "0.25",
    ]) == 0
    pooled = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # one split over the 8-frame pool: int(8 * 0.25) = 2 val samples
    # (the per-sequence protocol would split each sequence separately)
    assert pooled["n_samples"] == 2
    assert 0.0 <= pooled["mean_iou"] <= 1.0


def test_refine_cli(tmp_path):
    """refine: backward-sweep refinement of existing masks, no model needed."""
    import numpy as np

    from unetseg_tpu.data.io import read_image, write_mask_u8, write_mask_u16
    from unetseg_tpu.post.temporal import temporal_instance_masks

    masks = tmp_path / "RES"
    insts = tmp_path / "INST"
    out = tmp_path / "OUT"
    masks.mkdir(); insts.mkdir()
    # frame 0 merged blob, frame 1 separated (the early-frame NS shape)
    f0 = np.zeros((64, 96), np.uint8); f0[16:48, 12:80] = 255
    f1 = np.zeros((64, 96), np.uint8)
    f1[16:48, 12:42] = 255; f1[16:48, 50:80] = 255
    prev = None
    for i, b in enumerate((f0, f1)):
        write_mask_u8(str(masks / f"mask{i:03d}.tif"), (b > 0).astype(np.uint8))
        inst = temporal_instance_masks(b > 0, prev, min_size=5,
                                       min_overlap=100, backend="python")
        write_mask_u16(str(insts / f"m{i:03d}.tif"), inst)
        prev = inst
    assert read_image(str(insts / "m000.tif")).max() == 1  # merged

    from unetseg_tpu.cli.main import main
    rc = main(["refine", "--masks-dir", str(masks),
               "--instance-dir", str(insts), "--output-dir", str(out)])
    assert rc == 0
    r0 = read_image(str(out / "m000.tif"))
    assert r0.max() == 2  # split by the backward sweep
