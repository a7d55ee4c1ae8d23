"""Parse a jax.profiler XSpace trace into a per-op time table.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python scripts/parse_trace.py [trace_dir] [top_n]

Aggregates XLA-op durations on the TPU device plane (self time per op name
across all line events), printing the top-N ops and a category rollup —
the hand-rolled replacement for tensorboard_plugin_profile's op stats
(its xspace_to_tools_data API drifted in this image).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    return xs


def _categorize(name: str) -> str:
    n = name.lower()
    if "flash" in n or "pallas" in n or "custom-call" in n:
        return "pallas/custom"
    if n.startswith("%fusion") or ".fusion" in n or "fusion" in n:
        if "conv" in n:
            return "conv fusion"
        if "reduce" in n:
            return "reduce fusion"
        return "elementwise fusion"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout copy"
    if "reduce" in n:
        return "reduce"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "rng" in n:
        return "rng"
    return "other"


def op_table(xs, device_only: bool = True):
    """{op_name: total_ps} from the device plane's 'XLA Ops' line — the
    sequential op timeline (NOT 'XLA Modules' which wraps the whole program,
    and NOT 'Async XLA Ops' whose copy-start spans cover their wait time)."""
    totals = collections.Counter()
    plane_names = []
    for plane in xs.planes:
        plane_names.append(plane.name)
        if device_only and "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if device_only and line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                totals[name] += ev.duration_ps
    return totals, plane_names


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/moca_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = load_xspace(trace_dir)
    totals, planes = op_table(xs)
    if not totals:  # no TPU plane match — dump plane names and retry all
        print("planes:", planes)
        totals, _ = op_table(xs, device_only=False)
    grand = sum(totals.values())
    print(f"total device time: {grand / 1e12:.3f} s over {len(totals)} ops")
    cats = collections.Counter()
    for name, ps in totals.items():
        cats[_categorize(name)] += ps
    print("\n-- category rollup --")
    for cat, ps in cats.most_common():
        print(f"{ps / 1e9:12.2f} ms  {100 * ps / grand:5.1f}%  {cat}")
    print(f"\n-- top {top_n} ops --")
    for name, ps in totals.most_common(top_n):
        print(f"{ps / 1e9:12.2f} ms  {100 * ps / grand:5.1f}%  {name[:150]}")


if __name__ == "__main__":
    main()
