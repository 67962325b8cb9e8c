"""Summarize a JAX xplane.pb trace: per-op device self-time table.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/parse_xplane.py <trace_dir_or_xplane.pb> [top_n]

Parses the raw XSpace proto (no tensorboard pipeline needed): device lines
hold XEvents whose metadata names are the XLA op names; self time = event
duration (TPU ops don't nest on the device line).
"""

import collections
import glob
import os
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if os.path.isdir(path):
        xs = sorted(glob.glob(os.path.join(path, "**/*.xplane.pb"),
                              recursive=True))
        path = xs[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    n_ev = collections.Counter()
    for plane in space.planes:
        pname = plane.name
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # device op lines only (skip step/annotation lines)
            if "step" in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps / 1e6  # -> us
                n_ev[name] += 1
    if not per_op:
        print("planes found:")
        for plane in space.planes:
            print(" ", plane.name, [ln.name for ln in plane.lines][:6])
        return
    tot = sum(per_op.values())
    print(f"device op time total: {tot/1e3:.2f} ms")
    print(f"{'op':72s} {'n':>5s} {'ms':>9s} {'%':>6s}")
    for name, us in per_op.most_common(top_n):
        print(f"{name[:72]:72s} {n_ev[name]:5d} {us/1e3:9.3f} {100*us/tot:6.1f}")


if __name__ == "__main__":
    main()
