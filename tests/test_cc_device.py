"""On-device connected components vs scipy ground truth."""

import numpy as np
import pytest
import jax.numpy as jnp

from unetseg_tpu.post.cc import get_instance_masks
from unetseg_tpu.post.cc_device import (
    get_instance_masks_device,
    label_components_device,
)


def test_matches_scipy_labeling_random():
    rs = np.random.RandomState(0)
    m = (rs.rand(64, 80) > 0.7).astype(np.uint8)
    dev = get_instance_masks_device(m, min_size=1)
    ref = get_instance_masks(m, min_size=1, relabel=True)
    np.testing.assert_array_equal(dev, ref)


def test_matches_scipy_with_min_size():
    rs = np.random.RandomState(1)
    m = (rs.rand(48, 48) > 0.75).astype(np.uint8)
    dev = get_instance_masks_device(m, min_size=5)
    ref = get_instance_masks(m, min_size=5, relabel=True)
    np.testing.assert_array_equal(dev, ref)


def test_diagonal_connectivity():
    m = np.zeros((6, 6), np.uint8)
    m[0, 0] = 1
    m[1, 1] = 1
    m[2, 2] = 1
    dev = get_instance_masks_device(m, min_size=1)
    assert len(set(np.unique(dev)) - {0}) == 1


def test_spiral_component_converges():
    """A long snake: worst case for propagation depth."""
    m = np.zeros((32, 32), np.uint8)
    m[0, :] = 1
    m[:, -1] = 1
    m[-1, :] = 1
    m[2:, 0] = 1
    dev = get_instance_masks_device(m, min_size=1)
    ref = get_instance_masks(m, min_size=1, relabel=True)
    np.testing.assert_array_equal(dev, ref)


def test_empty():
    assert get_instance_masks_device(np.zeros((8, 8), np.uint8)).sum() == 0


def test_raw_labels_are_min_flat_index():
    m = np.zeros((4, 8), np.uint8)
    m[1, 2:5] = 1
    raw = np.asarray(label_components_device(jnp.asarray(m)))
    # component's smallest flat index is (1*8+2) -> label 11
    assert set(np.unique(raw)) == {0, 11}
