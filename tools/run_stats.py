"""Summarise a training run's scalars.jsonl: steady-state driver
throughput (from wall timestamps, excluding compile/eval pauses),
loss ranges, and the eval-metric trend.

Usage: python tools/run_stats.py <logdir> [batch_size]

Steady-state definition: per-interval rate between consecutive log rows
(step delta / time delta x batch); the reported figure is the median of
the intervals after dropping the first (compile) and any interval
containing an eval epoch (rate < 0.25 x median of the rest), matching
how BASELINE.md quotes driver-loop throughput.
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    logdir = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rows = []
    with open(f"{logdir}/scalars.jsonl") as f:
        for line in f:
            rows.append(json.loads(line))
    train = [r for r in rows if "loss_g" in r]
    evals = [r for r in rows if any(k.startswith("metrics/") for k in r)]
    if len(train) < 3:
        sys.exit("not enough log rows")
    rates = []
    for a, b in zip(train, train[1:]):
        ds, dt = b["step"] - a["step"], b["time"] - a["time"]
        if ds > 0 and dt > 0:
            rates.append(ds * batch / dt)
    rates_sorted = sorted(rates[1:])  # drop the compile interval
    med = rates_sorted[len(rates_sorted) // 2]
    steady = [r for r in rates[1:] if r >= 0.25 * med]
    steady_med = sorted(steady)[len(steady) // 2]
    total_s = train[-1]["time"] - train[0]["time"]
    print(
        f"steps {train[0]['step']}..{train[-1]['step']}  wall {total_s:.0f}s"
        f"  steady-state {steady_med:,.0f} img/s"
        f"  (median over {len(steady)}/{len(rates)} intervals)"
    )
    lg = [r["loss_g"] for r in train]
    ld = [r["loss_d"] for r in train]
    print(
        f"loss_g [{min(lg):.3f}, {max(lg):.3f}] last {lg[-1]:.3f} | "
        f"loss_d [{min(ld):.3f}, {max(ld):.3f}] last {ld[-1]:.3f}"
    )
    for r in evals:
        keys = {
            k.removeprefix("metrics/"): (
                f"{v:.6g}" if isinstance(v, float) else v
            )
            for k, v in r.items()
            if k.startswith("metrics/") and not k.endswith("_std")
        }
        print(f"eval @ step {r.get('step', '?')}: {keys}")


if __name__ == "__main__":
    main()
