"""In-context A/B of the fused packed-BN+GELU Pallas family on the real
chip (VERDICT r3 item 1 / tools/chip_runbook.md round-4 item 1).

Runs bench.py in a subprocess per configuration (the dispatch flag is
read at trace time) and writes one JSON table:

  * FFC_TPU_FUSED_BN in {0, 1} at 128px — the lever's target shape
    ((64,128,128,128)-class maps; BASELINE.md round-3 sink table puts
    the packed-BN stat reduces at ~3.6 ms and the norm/GELU fusions
    below roofline);
  * the same pair at 256px (packed is on there too);
  * 32px control (packed OFF below 128px, so the kernels never engage —
    the pair must measure equal within noise).

Decision rule: flip the ops/pallas/bn_act.py default ON iff the 128px
win exceeds noise (±2%) and 256px does not regress; either way record
the table in BASELINE.md (a measured refutation also closes the lever).

Usage (on the TPU):
    python tools/fusedbn_ab.py [RUNS/fusedbn_ab.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra: dict, timeout: float = 1500.0) -> dict:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    out = {"env": env_extra, "rc": r.returncode}
    try:
        out["result"] = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        out["result"] = {"raw_stdout": r.stdout[-300:]}
    for line in (r.stderr or "").strip().splitlines()[::-1]:
        if line.startswith("{"):
            try:
                out["detail"] = json.loads(line)
                break
            except Exception:
                continue
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RUNS/fusedbn_ab.json"
    table = {"fused_bn": []}
    for res in (128, 256, 32):
        for fused in (0, 1):
            row = run_bench({
                "FFC_TPU_BENCH_RES": res,
                "FFC_TPU_FUSED_BN": fused,
            })
            row["res"] = res
            row["fused"] = fused
            table["fused_bn"].append(row)
            print(json.dumps(row))
            result = row["result"]
            if isinstance(result, dict) and result.get("skipped"):
                print("backend unavailable — aborting A/B", file=sys.stderr)
                return
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
