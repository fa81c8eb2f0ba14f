"""Summarize a jax.profiler xplane trace (--profile-dir output) by device
op: the trace-backed ground truth for where kernel time goes.

Usage: python bench/trace_report.py /path/to/profile_dir
Finds the newest plugins/profile/*/ *.xplane.pb under the directory and
prints per-line op totals for the TPU device plane. Needs tensorflow's
bundled xplane proto (present in this environment).
"""

import collections
import glob
import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shark_trace"
    pbs = sorted(
        glob.glob(os.path.join(root, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime,
    )
    if not pbs:
        print(f"no xplane.pb under {root}", file=sys.stderr)
        return 1
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    sp = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        sp.ParseFromString(f.read())
    for plane in sp.planes:
        if "device" not in plane.name or "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        print(f"== {plane.name} ({pbs[-1]})")
        for line in plane.lines:
            if not line.events:
                continue
            dur = collections.Counter()
            for ev in line.events:
                dur[md[ev.metadata_id].name] += ev.duration_ps
            tot = sum(dur.values())
            print(f"-- {line.name}: {len(line.events)} events, {tot/1e9:.1f} ms")
            for name, d in dur.most_common(15):
                print(f"   {d/1e9:9.2f} ms  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
