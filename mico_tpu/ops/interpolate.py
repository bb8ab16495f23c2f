"""Interpolation ops with PyTorch `F.interpolate` semantics.

The reference uses torch interpolation in three numerically sensitive spots:
  - frame-embedding resize, mode='nearest'          (model/mico.py:195-204)
  - ViT pos-embed resize, mode='bilinear'           (inference_demo.py:61-97)
  - image resize / mel resize, mode='bilinear'      (model/imageprocessor.py:26,
                                                     model/audioprocessor.py:42-43)

`jax.image.resize` uses a different (anti-aliased) convention for
downsampling, so we implement torch's exact sampling rules:
  - nearest:  src = floor(dst * in/out)
  - bilinear (align_corners=False): src = (dst + 0.5) * in/out - 0.5,
    clamped, 2-tap lerp per axis (separable), no antialias.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def interp_nearest_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize along the last axis of (..., L)."""
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    idx = jnp.floor(
        jnp.arange(out_len, dtype=jnp.float32) * (in_len / out_len)
    ).astype(jnp.int32)
    idx = jnp.clip(idx, 0, in_len - 1)
    return jnp.take(x, idx, axis=-1)


def _bilinear_weights(in_len: int, out_len: int):
    """Source indices + lerp weights for one axis (align_corners=False)."""
    scale = in_len / out_len
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, float(in_len - 1))
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_len - 1)
    i1 = jnp.clip(i0 + 1, 0, in_len - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _interp_axis(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    i0, i1, w1 = _bilinear_weights(in_len, out_len)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    w1 = w1.reshape(shape).astype(x.dtype)
    return x0 * (1 - w1) + x1 * w1


def interp_bilinear_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of the last two axes of (..., H, W),
    matching torch F.interpolate(mode='bilinear', align_corners=False)."""
    x = _interp_axis(x, out_hw[0], axis=x.ndim - 2)
    x = _interp_axis(x, out_hw[1], axis=x.ndim - 1)
    return x


def resize_bilinear_no_antialias(
    img: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Alias with image-flavored name: (..., H, W) bilinear resize exactly as
    torchvision's tensor-mode `Resize` (antialias off) used by the reference
    preprocessing (model/imageprocessor.py:26-38)."""
    return interp_bilinear_2d(img, out_hw)


# ---- host (numpy) twins --------------------------------------------------
#
# The media loaders run in host threads; dispatching a per-item device
# program from there costs ~200 ms through a tunneled chip and contends
# with the model on local chips, so the data path uses these numpy twins
# of the exact same sampling math.


def _interp_axis_np(x: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    scale = in_len / out_len
    src = (np.arange(out_len, dtype=np.float32) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, float(in_len - 1))
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_len - 1)
    i1 = np.clip(i0 + 1, 0, in_len - 1)
    w1 = (src - i0.astype(np.float32)).astype(x.dtype)
    x0 = np.take(x, i0, axis=axis)
    x1 = np.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    w1 = w1.reshape(shape)
    return x0 * (1 - w1) + x1 * w1


def interp_bilinear_2d_np(x: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host twin of interp_bilinear_2d — identical sampling rules
    (torch bilinear, align_corners=False, no antialias), pure numpy."""
    x = _interp_axis_np(x, out_hw[0], axis=x.ndim - 2)
    return _interp_axis_np(x, out_hw[1], axis=x.ndim - 1)
