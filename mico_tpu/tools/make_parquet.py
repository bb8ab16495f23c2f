"""HDVILA-100M metadata: jsonl → parquet with clip spans in seconds.

Capability parity with reference data/makeparquet.py:1-60: each jsonl line
carries {video_id, url, clip: [{span: ["HH:MM:SS.mmm", ...]}, ...]};
output parquet columns (video_id, url, clips) with spans converted to
float seconds — the input format `video2dataset` consumes
(data/download_hdvila.sh).

Usage: python -m mico_tpu.tools.make_parquet <jsonl_dir> [out.parquet]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from typing import List


def time_string_to_seconds(timestamp: str) -> float:
    hh, mm, s = timestamp.split(":")
    ss, ms = s.split(".")
    return 3600 * int(hh) + 60 * int(mm) + int(ss) + int(ms) / 1000


def convert_clip_list(clip_list) -> List[List[float]]:
    return [[time_string_to_seconds(x) for x in clip] for clip in clip_list]


def collect_rows(jsonl_dir: str) -> List[dict]:
    rows = []
    for path in sorted(glob.glob(os.path.join(jsonl_dir, "*.jsonl"))):
        with open(path) as f:
            for line in f:
                obj = json.loads(line)
                spans = [c["span"] for c in obj["clip"]]
                rows.append(
                    {
                        "video_id": obj["video_id"],
                        "url": obj["url"],
                        "clips": convert_clip_list(spans),
                    }
                )
    return rows


def main(jsonl_dir: str, out_path: str = "hd_vila.parquet") -> str:
    import pandas as pd

    df = pd.DataFrame(collect_rows(jsonl_dir))
    df.to_parquet(out_path)
    return out_path


if __name__ == "__main__":
    main(*sys.argv[1:])
