"""Data IO + dataset tests against a synthetic CTC-layout tree (and the real
reference tree when mounted)."""

import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE_ROOT, requires_reference_data
from unetseg_tpu.core.config import DataConfig
from unetseg_tpu.data.dataset import (
    HeLaArrays,
    iter_batches,
    num_batches,
    train_val_split,
)
from unetseg_tpu.data.io import (
    SequencePaths,
    file_number_str,
    frame_number,
    index_sequence,
    prediction_dirs,
    read_image,
    write_mask_u16,
    write_mask_u8,
)


@pytest.fixture
def ctc_tree(tmp_path):
    """Synthetic CTC layout: 5 frames, 3 with masks+weight maps."""
    root = tmp_path / "DIC-C2DH-HeLa"
    seq = root / "01"
    seg = root / "01_ST" / "SEG"
    wm = root / "01_ST" / "WEIGHT_MAPS"
    for d in (seq, seg, wm):
        d.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray((rs.rand(64, 64) * 255).astype(np.uint8)).save(
            seq / f"t{i:03d}.tif"
        )
        if i < 3:
            m = np.zeros((64, 64), np.uint16)
            m[10:30, 10:30] = 1
            m[40:60, 35:55] = 2
            Image.fromarray(m).save(seg / f"man_seg{i:03d}.tif")
            np.save(wm / f"weight_map_{i:03d}.npy", rs.rand(64, 64).astype(np.float64))
    return str(root)


def test_index_sequence_pairs_triplets(ctc_tree):
    paths = SequencePaths(ctc_tree, "01")
    triplets = index_sequence(paths)
    assert len(triplets) == 3  # frames 3,4 lack masks
    assert all(t.weight_map for t in triplets)


def test_index_sequence_missing_dir_raises(ctc_tree):
    with pytest.raises(FileNotFoundError):
        index_sequence(SequencePaths(ctc_tree, "99"))


def test_load_arrays(ctc_tree):
    data = HeLaArrays.load(DataConfig(data_root=ctc_tree, sequence="01"))
    assert len(data) == 3
    assert data.images.dtype == np.float32
    assert 0.0 <= data.images.min() and data.images.max() <= 1.0
    assert data.masks.dtype == np.int32
    assert set(np.unique(data.masks)) == {0, 1, 2}
    assert data.weight_maps.dtype == np.float32


def test_split_deterministic():
    a1, b1 = train_val_split(84, 0.1, seed=0)
    a2, b2 = train_val_split(84, 0.1, seed=0)
    assert (a1 == a2).all() and (b1 == b2).all()
    assert len(b1) == 8 and len(a1) == 76  # int(84*0.1) like the reference
    assert set(a1) | set(b1) == set(range(84))


def test_iter_batches_pads_last(ctc_tree):
    data = HeLaArrays.load(DataConfig(data_root=ctc_tree, sequence="01"))
    batches = list(iter_batches(data, [0, 1, 2], batch_size=2, shuffle=False, seed=0))
    assert len(batches) == 2
    assert batches[0].valid.tolist() == [True, True]
    assert batches[1].valid.tolist() == [True, False]
    assert batches[1].images.shape == (2, 64, 64)
    assert num_batches(3, 2) == 2


def test_iter_batches_shuffle_reproducible(ctc_tree):
    data = HeLaArrays.load(DataConfig(data_root=ctc_tree, sequence="01"))
    b1 = [b.images.sum() for b in iter_batches(data, [0, 1, 2], 2, True, seed=7)]
    b2 = [b.images.sum() for b in iter_batches(data, [0, 1, 2], 2, True, seed=7)]
    assert b1 == b2


def test_mask_roundtrip_u16(tmp_path):
    m = np.zeros((32, 32), np.uint16)
    m[5:10, 5:10] = 1234
    p = str(tmp_path / "m000.tif")
    write_mask_u16(p, m)
    back = read_image(p)
    assert back.dtype in (np.uint16, np.int32)  # PIL I;16 loads as uint16/int32
    np.testing.assert_array_equal(np.asarray(back, np.uint16), m)


def test_mask_roundtrip_u8(tmp_path):
    m = (np.eye(16) > 0).astype(np.uint8)
    p = str(tmp_path / "mask000.tif")
    write_mask_u8(p, m)
    back = read_image(p)
    np.testing.assert_array_equal(back, m * 255)


def test_frame_number_and_file_number():
    assert frame_number("/x/t012.tif") == 12
    assert frame_number("/x/mask007.tif") == 7
    assert frame_number("/x/man_seg000.tif") == 0
    assert file_number_str("/x/t045.tif") == "045"


def test_prediction_dirs_layout(tmp_path):
    root = str(tmp_path / "data" / "raw" / "train" / "DIC-C2DH-HeLa")
    res, inst = prediction_dirs(root, "01")
    assert res.endswith(os.path.join("processed", "predictions", "DIC-C2DH-HeLa", "01_RES"))
    assert inst.endswith("01_RES_INST")


@requires_reference_data
def test_load_real_reference_sequence():
    root = os.path.join(REFERENCE_ROOT, "data/raw/train/DIC-C2DH-HeLa")
    data = HeLaArrays.load(DataConfig(data_root=root, sequence="01"))
    assert len(data) == 84
    assert data.images.shape == (84, 512, 512)
    assert data.masks.max() > 1  # instance labels
