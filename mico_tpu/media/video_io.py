"""Video decode (host): native libav gather with an OpenCV fallback.

Replaces decord.VideoReader + get_batch
(reference model/videoprocessor.py:80-89, data/data/vision_mapper.py:139-149).
The primary path is the C++ decoder (mico_tpu/csrc/video_decode.cpp —
demux → decode → RGB24, keyframe-seek accelerated batched frame gather);
cv2.VideoCapture covers environments without the native build. Frame
indices are selected by the chunk-sampling policy; frames return as float32
RGB CHW in [0, 1].
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import List, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")


@functools.lru_cache(maxsize=1)
def _lib():
    path = os.path.join(_CSRC, "libmico_media.so")
    lib = None
    try:
        if not os.path.exists(path):
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        lib = ctypes.CDLL(path)
        lib.mico_video_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mico_video_info.restype = ctypes.c_int
        lib.mico_video_read_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.mico_video_read_frames.restype = ctypes.c_int
    except (OSError, AttributeError, subprocess.CalledProcessError):
        lib = None
    return lib


def _native_info(path: str):
    lib = _lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.mico_video_info(
        path.encode(), ctypes.byref(n), ctypes.byref(w), ctypes.byref(h)
    )
    if rc != 0:
        raise IOError(f"video probe failed ({rc}): {path}")
    return n.value, w.value, h.value


def video_num_frames(path: str) -> int:
    info = _native_info(path)
    if info is not None:
        return info[0]
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
    lib = _lib()
    if lib is not None:
        info = _native_info(path)
        _, w, h = info
        idx = np.asarray(list(indices), np.int64)
        out = np.empty((len(idx), h, w, 3), np.uint8)
        rc = lib.mico_video_read_frames(
            path.encode(),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w,
            h,
        )
        if rc != 0:
            raise IOError(f"video decode failed ({rc}): {path}")
        return np.ascontiguousarray(
            out.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        )
    return _read_frames_cv2(path, indices)


def _read_frames_cv2(path: str, indices: Sequence[int]) -> np.ndarray:
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
