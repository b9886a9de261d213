"""Golden tests against the artifacts the reference repo ships: our
post-processing and tracking reproduce the reference's own outputs
bit-for-bit from its own inputs."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE_ROOT, requires_reference_data
from unetseg_tpu.data.io import frame_number
from unetseg_tpu.post.cc import get_instance_masks
from unetseg_tpu.track.tracker import Tracker

PRED = os.path.join(
    REFERENCE_ROOT, "data/raw/processed/predictions/DIC-C2DH-HeLa"
)


@requires_reference_data
@pytest.mark.parametrize("num", ["000", "020", "050", "083"])
def test_connected_components_bit_exact(num):
    """binary mask{N}.tif -> our CC == the shipped m{N}.tif, including label
    ids and ordering (reference: scripts/predict.py:96 + utils/metrics.py:42)."""
    b = np.array(Image.open(os.path.join(PRED, "01_RES", f"mask{num}.tif")))
    ref = np.array(Image.open(os.path.join(PRED, "01_RES_INST", f"m{num}.tif")))
    ours = get_instance_masks(b, min_size=15)
    np.testing.assert_array_equal(ours, np.asarray(ref, np.uint16))


@requires_reference_data
def test_tracker_reproduces_shipped_res_track_exactly():
    """Faithful mode on the shipped instance masks reproduces the shipped
    res_track.txt line-for-line (all 10,807 tracks, including the
    interleaved active-map and parent=-1 behaviors)."""
    files = sorted(glob.glob(os.path.join(PRED, "01_RES_INST", "m*.tif")))
    assert len(files) == 84
    tr = Tracker(faithful_active_map=True)
    for f in files:
        tr.update(np.array(Image.open(f)), frame_number(f))
    ours = [
        f"{t.label} {t.start_frame} {max(t.start_frame, t.end_frame)} "
        f"{t.parent_label if t.parent_label > 0 else -1}"
        for t in tr.tracks()
    ]
    with open(os.path.join(PRED, "01", "res_track.txt")) as f:
        ref = f.read().splitlines()
    assert len(ours) == len(ref) == 10807
    assert ours == ref
