"""Summarize a jax.profiler trace: per-op device time from the xplane proto.

The reference has no profiling at all (SURVEY §5.1); mico_tpu captures
traces via `mico_tpu.utils.profiling.trace(logdir)` (jax.profiler). This
tool turns those traces into the per-op tables BASELINE.md quotes, without
needing a TensorBoard UI: it walks the XSpace proto (via tensorflow's
xplane_pb2, baked into the image) and aggregates device-plane event
durations by op / HLO category.

Usage:
  python scripts/trace_summary.py <logdir-or-xplane.pb> [--top 30]
      [--line "XLA Ops"] [--group-by op|category]

Typical flow:
  from mico_tpu.utils import profiling
  with profiling.trace("/tmp/prof"):
      step(...); jax.block_until_ready(...)
  # then:  python scripts/trace_summary.py /tmp/prof
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


def load_xspace(path: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older/newer TF layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_planes(xs):
    """TPU/accelerator device planes (fall back to anything non-host)."""
    dev = [p for p in xs.planes if "/device:TPU" in p.name
           or p.name.startswith("/device:")]
    return dev or [p for p in xs.planes if "Host" not in p.name]


def summarize(xs, line_filter: str, group_by: str):
    """→ (rows, total_ns, wall_ns): rows = [(key, total_ns, count)]."""
    agg = collections.Counter()
    cnt = collections.Counter()
    wall_lo, wall_hi = None, 0
    for plane in device_planes(xs):
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                md = emeta.get(ev.metadata_id)
                name = md.name if md else f"id{ev.metadata_id}"
                # events carry the full HLO instruction text; keep the
                # instruction name (the part before " = ")
                key = name.split(" = ")[0].strip()
                if group_by == "category":
                    cat = None
                    for st in ev.stats:
                        sm = smeta.get(st.metadata_id)
                        if sm is not None and sm.name == "hlo_category":
                            cat = st.str_value or None
                            break
                    if cat is None:
                        # fall back: strip %, numbering, and clone suffixes
                        cat = re.sub(r"\.[\d.]+$", "", key.lstrip("%"))
                        cat = re.sub(r"(\.clone|\.remat\w*)$", "", cat)
                    key = cat
                t0 = line.timestamp_ns + ev.offset_ps // 1000
                t1 = t0 + ev.duration_ps // 1000
                wall_lo = t0 if wall_lo is None else min(wall_lo, t0)
                wall_hi = max(wall_hi, t1)
                agg[key] += ev.duration_ps // 1000
                cnt[key] += 1
    rows = [(k, v, cnt[k]) for k, v in agg.most_common()]
    total = sum(agg.values())
    wall = (wall_hi - wall_lo) if wall_lo is not None else 0
    return rows, total, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile logdir or .xplane.pb file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default="XLA Ops",
                    help="substring of the trace line to read "
                         "('' = all device lines)")
    ap.add_argument("--group-by", default="op", choices=["op", "category"])
    ap.add_argument("--contains", default="",
                    help="only ops whose name contains this substring")
    args = ap.parse_args()

    path = find_xplane(args.path)
    xs = load_xspace(path)
    rows, total, wall = summarize(xs, args.line, args.group_by)
    if args.contains:
        rows = [r for r in rows if args.contains in r[0]]
    if not rows:
        lines = sorted(
            {ln.name for p in device_planes(xs) for ln in p.lines}
        )
        sys.exit(
            f"no events on lines matching {args.line!r}; available device "
            f"lines: {lines}"
        )
    print(f"# {path}")
    print(f"# device busy {total/1e6:.3f} ms over span {wall/1e6:.3f} ms "
          f"({100*total/max(wall,1):.1f}% occupancy)")
    print(f"{'time ms':>10} {'%busy':>6} {'calls':>7}  name")
    for name, ns, n in rows[: args.top]:
        print(f"{ns/1e6:10.3f} {100*ns/max(total,1):6.2f} {n:7d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
