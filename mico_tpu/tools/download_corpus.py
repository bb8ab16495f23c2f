"""HDVILA-100M corpus download driver.

Capability parity with reference data/download_hdvila.sh + data/config.yaml:
drives `video2dataset` over the parquet produced by
`mico_tpu.tools.make_parquet` — 360p mp4 + 44.1 kHz mp3, English subtitle
scrape, scene-cut detection, 100-sample tar shards, multiprocess
distribution, 3 shard retries. `video2dataset` is an optional dependency;
without it this prints the exact invocation instead of failing cryptically.

Usage:
  python -m mico_tpu.tools.download_corpus hd_vila.parquet ./hdvila \
      [--processes 2] [--threads 8]
"""

from __future__ import annotations

import argparse
import sys

# data/config.yaml, expressed as the video2dataset config dict
V2D_CONFIG = {
    "subsampling": {
        "CutDetectionSubsampler": {
            "args": {
                "cut_detection_mode": "all",
                "framerates": None,
                "threshold": 11.5,
                "min_scene_len": 15,
            }
        }
    },
    "reading": {
        "yt_args": {
            "download_size": 360,
            "download_audio_rate": 44100,
            "yt_metadata_args": {
                "writesubtitles": "all",
                "subtitleslangs": ["en"],
                "writeautomaticsub": True,
                "get_info": True,
            },
        },
        "timeout": 180,
        "sampler": None,
    },
    "storage": {
        "number_sample_per_shard": 100,
        "captions_are_subtitles": False,
        "oom_shard_count": 5,
    },
    "distribution": {
        "processes_count": 2,
        "thread_count": 8,
        "subjob_size": 1000,
        "distributor": "multiprocessing",
    },
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("url_list", help="parquet from mico_tpu.tools.make_parquet")
    ap.add_argument("output_folder")
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--max-shard-retry", type=int, default=3)
    args = ap.parse_args(argv)

    cfg = dict(V2D_CONFIG)
    cfg["distribution"] = dict(
        cfg["distribution"],
        processes_count=args.processes,
        thread_count=args.threads,
    )
    kwargs = dict(
        url_list=args.url_list,
        input_format="parquet",
        output_format="files",
        output_folder=args.output_folder,
        url_col="url",
        enable_wandb=False,
        encode_formats={"video": "mp4", "audio": "mp3"},
        config=cfg,
        max_shard_retry=args.max_shard_retry,
    )
    try:
        from video2dataset import video2dataset
    except ImportError:
        print(
            "video2dataset is not installed in this environment.\n"
            "On a connected machine: pip install video2dataset, then rerun; "
            "equivalent call:\n  video2dataset(" +
            ", ".join(f"{k}={v!r}" for k, v in kwargs.items()) + ")"
        )
        return 1
    video2dataset(**kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
