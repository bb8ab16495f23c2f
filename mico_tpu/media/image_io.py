"""Image decode (host): OpenCV with PIL fallback.

Replaces PIL.Image.open + convert('RGB') + ToTensor
(reference model/imageprocessor.py:49-51). Returns float32 RGB in [0, 1],
shape (3, H, W) — the torch CHW layout the processors expect.
"""

from __future__ import annotations

import numpy as np


def load_image_chw(path: str) -> np.ndarray:
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)  # handles gray/CMYK → 3ch
    if bgr is None:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        rgb = np.asarray(img)
    else:
        rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(
        rgb.transpose(2, 0, 1).astype(np.float32) / 255.0
    )
