"""Offline frame/audio extraction over a video corpus.

Capability parity with reference data/utils/offline_process_data.py:22-86:
for each video, extract jpg frames at a fixed fps (`frames_fps{N}/<id>/
frame_%04d.jpg`) and a 16-bit mono wav at a target sample rate
(`audios/<id>.wav`), via ffmpeg in a multiprocessing pool.

Usage:
  python -m mico_tpu.tools.extract_media <input_dir> <output_dir> \
      [--fps 1] [--sr 22050] [--workers 20] [--frames/--no-frames]
      [--audio/--no-audio]
"""

from __future__ import annotations

import argparse
import os
import subprocess
from functools import partial
from multiprocessing import Pool


def extract_one(
    video_id: str,
    input_dir: str,
    output_dir: str,
    fps: float,
    sr: int,
    do_frames: bool,
    do_audio: bool,
) -> str:
    video_path = os.path.join(input_dir, video_id)
    if not os.path.exists(video_path):
        return f"missing {video_id}"
    name = os.path.splitext(os.path.basename(video_id))[0]
    try:
        if do_frames:
            frame_dir = os.path.join(output_dir, f"frames_fps{fps:g}", name)
            os.makedirs(frame_dir, exist_ok=True)
            subprocess.run(
                [
                    "ffmpeg", "-loglevel", "error", "-i", video_path,
                    "-vsync", "0", "-f", "image2", "-vf", f"fps=fps={fps:.02f}",
                    "-qscale:v", "2", os.path.join(frame_dir, "frame_%04d.jpg"),
                ],
                check=True,
            )
        if do_audio:
            audio_dir = os.path.join(output_dir, "audios")
            os.makedirs(audio_dir, exist_ok=True)
            subprocess.run(
                [
                    "ffmpeg", "-i", video_path, "-loglevel", "error",
                    "-f", "wav", "-vn", "-ac", "1", "-ab", "16k",
                    "-ar", str(sr), "-y",
                    os.path.join(audio_dir, name + ".wav"),
                ],
                check=True,
            )
        return f"ok {video_id}"
    except subprocess.CalledProcessError as e:
        return f"failed {video_id}: {e}"


def extract_all(
    input_dir: str,
    output_dir: str,
    fps: float = 1.0,
    sr: int = 22050,
    workers: int = 20,
    do_frames: bool = True,
    do_audio: bool = True,
):
    ids = sorted(os.listdir(input_dir))
    fn = partial(
        extract_one, input_dir=input_dir, output_dir=output_dir, fps=fps,
        sr=sr, do_frames=do_frames, do_audio=do_audio,
    )
    with Pool(workers) as pool:
        for i, msg in enumerate(pool.imap_unordered(fn, ids)):
            if not msg.startswith("ok"):
                print(msg)
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(ids)}")
    return len(ids)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--workers", type=int, default=20)
    p.add_argument("--frames", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--audio", action=argparse.BooleanOptionalAction, default=True)
    a = p.parse_args(argv)
    extract_all(
        a.input_dir, a.output_dir, a.fps, a.sr, a.workers, a.frames, a.audio
    )


if __name__ == "__main__":
    main()
