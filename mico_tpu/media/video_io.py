"""Video decode (host): OpenCV VideoCapture.

Replaces decord.VideoReader + get_batch
(reference model/videoprocessor.py:80-89). Frame indices are selected by the
chunk-sampling policy; frames return as float32 RGB CHW in [0, 1].
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def video_num_frames(path: str) -> int:
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def read_frames_chw(path: str, indices: Sequence[int]) -> np.ndarray:
    """→ (n, 3, H, W) float32 RGB in [0,1], in the order of `indices`."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        want = {}
        order: List[int] = list(indices)
        unique_sorted = sorted(set(order))
        pos = 0
        for idx in unique_sorted:
            if idx != pos:
                cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
                pos = idx
            ok, frame = cap.read()
            pos += 1
            if not ok:
                raise IOError(f"failed to read frame {idx} of {path}")
            want[idx] = np.ascontiguousarray(
                frame[:, :, ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0
            )
        return np.stack([want[i] for i in order])
    finally:
        cap.release()
