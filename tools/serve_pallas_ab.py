"""Serve-context A/B of the fused FourierUnit Pallas families.

Round-5 motivation (RUNS/serve_roofline_r5): ~21-27% of the serving
step at >=128px is XLA layout copies clustered at the DFT-as-matmul <->
convT boundary, with the three worst transposes running at ~37% of the
HBM roofline. The Pallas FourierUnit families keep the whole spectral
pipeline (and its relayouts) in VMEM — they were measured slower than
XLA in TRAINING context (ops/pallas/fourier_unit.py dispatch table),
but serving is forward-only with a different sink profile, so the
question is re-opened and answered by measurement here. The "sep2"
family fits the 128x128 maps where the slow copies live (the plain
"sep" family's VMEM working set does not at C=32).

Runs bench.py in a subprocess per configuration (dispatch flags are
read at import time) and writes one JSON table:

  * serve-128 batch 64:  FFC_TPU_PALLAS in {0, sep, sep2};
  * serve-128 batch 256: {0, sep2} (the recommended serving batch);
  * serve-256 batch 64:  {0, sep2};
  * serve-32  batch 64 control: {0, sep} (small maps, train-refuted
    territory — expected no-win; run to bound the harness noise).

Decision rule (same as tools/fusedbn_ab.py): flip the serve-path
default ON iff a >=128px win exceeds noise (+-2%) and no other tier
regresses; either way the table goes to BASELINE.md — a measured
refutation also closes the lever.

Usage (on the TPU):
    python tools/serve_pallas_ab.py [RUNS/serve_pallas_ab.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fusedbn_ab import run_bench  # noqa: E402  (shared subprocess helper)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RUNS/serve_pallas_ab.json"
    rows = []
    grid = [
        (128, 64, "0", None),
        (128, 64, "1", "sep"),
        (128, 64, "1", "sep2"),
        (128, 256, "0", None),
        (128, 256, "1", "sep2"),
        (256, 64, "0", None),
        (256, 64, "1", "sep2"),
        (32, 64, "0", None),
        (32, 64, "1", "sep"),
    ]
    for res, batch, pallas, mode in grid:
        env = {
            "FFC_TPU_BENCH_MODE": "serve",
            "FFC_TPU_BENCH_RES": res,
            "FFC_TPU_BENCH_BATCH": batch,
            "FFC_TPU_PALLAS": pallas,
        }
        if mode:
            env["FFC_TPU_PALLAS_MODE"] = mode
        row = run_bench(env)
        rows.append(row)
        val = (row.get("result") or {}).get("value")
        print(
            f"res={res} batch={batch} pallas={pallas}"
            f"{'/' + mode if mode else ''}: {val} img/s (rc={row['rc']})",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump({"serve_pallas": rows}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
