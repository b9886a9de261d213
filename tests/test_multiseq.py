"""Multi-sequence dataset concatenation."""

import numpy as np
import pytest
from PIL import Image

from unetseg_tpu.core.config import DataConfig
from unetseg_tpu.data.dataset import HeLaArrays


@pytest.fixture
def two_seq_tree(tmp_path):
    root = tmp_path / "HeLa"
    rs = np.random.RandomState(0)
    for seq, n in [("01", 3), ("02", 2)]:
        (root / seq).mkdir(parents=True)
        (root / f"{seq}_ST" / "SEG").mkdir(parents=True)
        (root / f"{seq}_ST" / "WEIGHT_MAPS").mkdir(parents=True)
        for i in range(n):
            Image.fromarray((rs.rand(32, 32) * 255).astype(np.uint8)).save(
                root / seq / f"t{i:03d}.tif"
            )
            m = np.zeros((32, 32), np.uint16)
            m[4:10, 4:10] = 1
            Image.fromarray(m).save(root / f"{seq}_ST" / "SEG" / f"man_seg{i:03d}.tif")
            np.save(
                root / f"{seq}_ST" / "WEIGHT_MAPS" / f"weight_map_{i:03d}.npy",
                np.ones((32, 32)),
            )
    return str(root)


def test_load_many_concatenates(two_seq_tree):
    data = HeLaArrays.load_many(
        DataConfig(data_root=two_seq_tree), ["01", "02"]
    )
    assert len(data) == 5
    assert data.images.shape == (5, 32, 32)
    assert len(data.files) == 5


def test_load_many_single(two_seq_tree):
    data = HeLaArrays.load_many(DataConfig(data_root=two_seq_tree), ["02"])
    assert len(data) == 2
