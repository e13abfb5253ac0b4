"""Summarize a JAX profiler xplane.pb: per-XLA-op device time, descending.

Usage:  python tools/xplane_summary.py /path/to/tracedir [top_n]

Walks the trace dir for ``*.xplane.pb``, picks the device plane(s)
(``/device:TPU`` / ``TPU:0``-style), aggregates event durations by the
event name (the XLA HLO op name, e.g. ``fusion.123``, ``sort.45``), and
prints the top-N with total ms, call count, and share of device time.
The ``%`` column is of the summed device-plane busy time, so overlapping
lines (rare on TPU) can push the total above the wall time of the step.

This is the op-level attribution companion to utils/profiling.py (survey
§5.1): it turns a ``--trace`` capture into the "which op eats the frame"
table without needing the TensorBoard profile plugin (whose native
converter is broken against the installed TF wheel).
"""
import collections
import gzip
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplanes(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".xplane.pb"):
                out.append(os.path.join(dirpath, f))
    return out


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    data = open(path, "rb").read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    xs.ParseFromString(data)
    return xs


def summarize(root, top_n=30):
    per_op = collections.Counter()
    per_op_calls = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for path in find_xplanes(root):
        xs = load(path)
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            if "Host" in plane.name:
                continue
            stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                lname = line.name.lower()
                # step-lines and derived lines double-count op time
                if any(s in lname for s in ("step", "annotation", "source",
                                            "framework", "scope")):
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    dur = ev.duration_ps / 1e9  # ps -> ms
                    per_op[name] += dur
                    per_op_calls[name] += 1
                    cat = name.split(".")[0].split("-")[0]
                    per_cat[cat] += dur
                    total += dur
    print(f"device busy time: {total:.2f} ms   ({root})")
    print(f"{'op':<58}{'ms':>10}{'calls':>7}{'%':>7}")
    for name, ms in per_op.most_common(top_n):
        print(f"{name[:57]:<58}{ms:>10.3f}{per_op_calls[name]:>7}"
              f"{100*ms/max(total,1e-9):>6.1f}%")
    print("\nby category:")
    for cat, ms in per_cat.most_common(15):
        print(f"  {cat:<30}{ms:>10.3f}  {100*ms/max(total,1e-9):>5.1f}%")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
