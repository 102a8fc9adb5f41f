"""In-context A/B of the conv-transpose lowerings + tapmix-bf16 on the
real chip (VERDICT r2 item 1 / BASELINE.md pending measurement 1).

Runs bench.py in a subprocess per configuration (the lowering mode is
read at trace time, so each measurement needs a fresh process) and
writes one JSON table:

  * FFC_TPU_CONVT in {lhs, subpixel, fusedk} at 32px and 128px — decides
    the default of ops/conv.py conv_transpose2d (the 128px profile
    attributes ~12% of the step to the lhs lowering's data-formatting
    copies + kernel reverses, BASELINE.md top-5 sinks; the alternatives
    are exact and parity-tested, tests/test_conv.py);
  * FFC_TPU_TAPMIX_BF16 in {0, 1} at 128px (halves the bytes of the
    to_rgb tap-accumulation fusion — the profile's add_tanh_fusion).

Usage (on the TPU; ~15 bench invocations, each self-timed):
    python tools/convt_ab.py [out.json]

Each bench run performs its own bounded backend preflight, so a downed
tunnel fails fast with a skip marker instead of hanging.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra: dict, timeout: float = 1200.0) -> dict:
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RUNS/convt_ab.json"
    table = {"convt": [], "tapmix_bf16": []}
    for res in (128, 32):
        for mode in ("lhs", "subpixel", "fusedk"):
            row = run_bench({
                "FFC_TPU_BENCH_RES": res,
                "FFC_TPU_CONVT": mode,
            })
            row["res"] = res
            row["mode"] = mode
            table["convt"].append(row)
            print(json.dumps(row))
            result = row["result"]
            if isinstance(result, dict) and result.get("skipped"):
                print("backend unavailable — aborting A/B", file=sys.stderr)
                return
    for bf16 in (0, 1):
        row = run_bench({
            "FFC_TPU_BENCH_RES": 128,
            "FFC_TPU_TAPMIX_BF16": bf16,
        })
        row["tapmix_bf16"] = bf16
        table["tapmix_bf16"].append(row)
        print(json.dumps(row))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
