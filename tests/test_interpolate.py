"""Interpolation parity vs torch.nn.functional.interpolate (CPU golden)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mico_tpu.ops import (
    interp_bilinear_2d,
    interp_nearest_1d,
)


@pytest.mark.parametrize("in_len,out_len", [(4, 8), (8, 4), (7, 3), (3, 7), (5, 5)])
def test_nearest_1d_matches_torch(rng, in_len, out_len):
    x = rng.standard_normal((2, 16, in_len)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), out_len, mode="nearest").numpy()
    got = np.asarray(interp_nearest_1d(jnp.asarray(x), out_len))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 16), (24, 24)), ((24, 24), (16, 16)), ((17, 13), (7, 29)), ((224, 224), (16, 16))],
)
def test_bilinear_2d_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(interp_bilinear_2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_image_resize_matches_torch(rng):
    # the preprocessing path: HWC uint8-ish image -> CHW resize
    img = rng.uniform(0, 1, (3, 480, 640)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(img)[None], (224, 224), mode="bilinear", align_corners=False
    )[0].numpy()
    got = np.asarray(interp_bilinear_2d(jnp.asarray(img), (224, 224)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
