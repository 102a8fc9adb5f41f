"""Per-op device-time sinks + effective-bandwidth table from a trace.

Usage: python tools/trace_sinks.py <profile_dir> [steps_per_call]

Companion to trace_hbm.py (which answers "where do the HBM bytes go"):
this answers "where does the device TIME go, and is each sink running
near its bandwidth bound". For every leaf op on the `XLA Ops` line it
aggregates duration and true-HBM bytes (memory_access_breakdown), then
prints

  - the top individual ops by device time, with ms/step, HBM GB/step,
    effective GB/s (HBM bytes / duration) and that as a % of the v5e
    819 GB/s roofline — a sink within ~15% of roofline is done, a sink
    far below it is either compute-bound (check the MXU story) or a
    fusion-shape problem worth attacking;
  - category totals (convolution fusions / loop fusions / formatting
    copies / reverses / other), comparable to the round-2 top-5 sink
    table in BASELINE.md.

The reference has no per-op accounting at all; its hot loop trusts
cuFFT + cudnn scheduling (reference layers/ffc/fourier_unity.py:38-56).
"""
from __future__ import annotations

import collections
import glob
import os
import sys

from trace_hbm import parse_breakdown  # same-dir import

V5E_HBM_GBPS = 819.0


def categorize(name: str) -> str:
    head = name.split(" = ")[0]
    if "convolution" in name or "conv" in head:
        return "convolution fusions"
    if "loop_fusion" in head or "loop" in head.split(".")[0]:
        return "loop fusions"
    if head.startswith("%copy") or "transpose" in head or "bitcast" in head:
        return "formatting copies"
    if "reverse" in head:
        return "reverse (convT bwd)"
    if "fusion" in head:
        return "other fusions"
    return "other"


def main() -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    profile_dir = sys.argv[1]
    steps_per_call = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    pbs = sorted(glob.glob(os.path.join(profile_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        sys.exit(f"no xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())

    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
    ev_meta = dict(plane.event_metadata.items())
    meta_hbm = {}
    for eid, em in ev_meta.items():
        for st in em.stats:
            if stat_names.get(st.metadata_id) == "memory_access_breakdown":
                meta_hbm[eid] = sum(
                    b for _op, space, b in parse_breakdown(st.bytes_value) if space == 1
                )

    mod_line = next(l for l in plane.lines if l.name == "XLA Modules")
    mod_durs = collections.defaultdict(list)
    for ev in mod_line.events:
        mod_durs[ev_meta[ev.metadata_id].name].append(ev.duration_ps / 1e12)
    main_mod, durs = max(mod_durs.items(), key=lambda kv: sum(kv[1]))
    n_steps = len(durs) * steps_per_call
    wall_s = sum(durs)
    print(
        f"module {main_mod.split('(')[0]}: {n_steps} steps, "
        f"{wall_s * 1e3 / n_steps:.3f} ms/step device"
    )

    line = next(l for l in plane.lines if l.name == "XLA Ops")
    op_time = collections.Counter()
    op_bytes = collections.Counter()
    op_count = collections.Counter()
    for ev in line.events:
        name = ev_meta[ev.metadata_id].name
        # control-flow wrappers (the K-chain while loop, conditionals)
        # contain their children on the same line — counting them would
        # double every leaf inside
        head = name.split(" = ")[0]
        if head.startswith(("%while", "%conditional", "%call")):
            continue
        op_time[name] += ev.duration_ps / 1e12
        op_bytes[name] += meta_hbm.get(ev.metadata_id, 0)
        op_count[name] += 1

    total_t = sum(op_time.values())
    print(f"leaf op time: {total_t * 1e3 / n_steps:.3f} ms/step "
          f"({total_t / wall_s * 100:.0f}% of module wall)")
    print("\ntop 20 ops by device time (per step):")
    print(f"{'ms':>7} {'%':>5} {'HBM GB':>8} {'GB/s':>6} {'%roof':>6}  op")
    for name, t in op_time.most_common(20):
        gb = op_bytes[name] / 1e9 / n_steps
        ms = t * 1e3 / n_steps
        bw = op_bytes[name] / 1e9 / t if t else 0.0
        print(
            f"{ms:7.3f} {t / total_t * 100:5.1f} {gb:8.3f} {bw:6.0f} "
            f"{bw / V5E_HBM_GBPS * 100:6.1f}  {name[:90]}"
        )

    cats_t = collections.Counter()
    cats_b = collections.Counter()
    for name, t in op_time.items():
        c = categorize(name)
        cats_t[c] += t
        cats_b[c] += op_bytes[name]
    print("\ncategory totals (per step):")
    for c, t in cats_t.most_common():
        bw = cats_b[c] / 1e9 / t if t else 0.0
        print(
            f"  {t * 1e3 / n_steps:8.3f} ms ({t / total_t * 100:4.1f}%) "
            f"{cats_b[c] / 1e9 / n_steps:8.3f} GB  {bw:5.0f} GB/s "
            f"({bw / V5E_HBM_GBPS * 100:4.1f}% roof)  {c}"
        )


if __name__ == "__main__":
    main()
