"""Audio decode: ctypes bridge to the native libav decoder
(mico_tpu/csrc/audio_decode.cpp), with a stdlib fallback for .wav.

Replaces torchaudio.load + Resample (reference model/audioprocessor.py:34-37).
Returns float32 mono in [-1, 1] — channel 0, Kaldi convention.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import wave
from typing import Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")


@functools.lru_cache(maxsize=1)
def _lib():
    path = os.path.join(_CSRC, "libmico_media.so")
    if not os.path.exists(path):
        subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(path)
    lib.mico_decode_audio.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mico_decode_audio.restype = ctypes.c_int
    lib.mico_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    return lib


def load_waveform(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """→ (float32 mono waveform at target_sr, source sample rate)."""
    lib = _lib()
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    src_sr = ctypes.c_int()
    rc = lib.mico_decode_audio(
        path.encode(), target_sr, ctypes.byref(data), ctypes.byref(n),
        ctypes.byref(src_sr),
    )
    if rc != 0:
        raise IOError(f"audio decode failed ({rc}): {path}")
    try:
        wav = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.mico_free(data)
    return wav, src_sr.value


def load_wav_stdlib(path: str) -> Tuple[np.ndarray, int]:
    """Pure-python .wav fallback (16-bit PCM), channel 0."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        nch = f.getnchannels()
        raw = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    return (raw.reshape(-1, nch)[:, 0] / 32768.0).astype(np.float32), sr
