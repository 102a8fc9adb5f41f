"""Benchmark: FFC-GAN training throughput on the flagship config.

Measures full GAN train steps (1 G update + 1 D update, hinge loss,
AdamW) of the reference protocol config — FFCGenerator 32px
(z=128, ngf=64, ratio 0.25, mg=4) vs the 7-conv SN discriminator,
batch 64 (reference fgan_complete.py:470-477) — on the default backend
(the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec, "unit": "img/s", "vs_baseline": r}
plus a second informational line with the roofline accounting
(FLOPs/step, bytes/step, MFU, HBM utilisation) on stderr.

``vs_baseline`` is the ratio to the first recorded run of this benchmark
(BENCH_BASELINE.json, written on first execution) — the reference
publishes no throughput numbers (BASELINE.md), so round-over-round
improvement is measured against our own round-1 number.

Roofline story (TPU v5e, measured round 2 from jax.profiler traces —
see BASELINE.md "trace-based roofline" for the full accounting): one
32px global step (2 G forwards + G backward + fused-128 D
forward/backward + both optimizers) is ~141 GFLOP at ~2.7-3.0 ms/step =
~24% of bf16 peak, with the device ~97% busy and the TRUE HBM traffic
only 0.22 GB/step compute + 0.09 DMA = 14% of bandwidth — XLA keeps the
activation working set in VMEM (S(1) buffers; on-chip accesses are
1.5 GB/step), so the step is op-mix/lane-bound, not memory-bound. The gap to peak is lane utilisation of the FFC
ladder's tail ops (32x32 maps with 3-48 channels against 128-wide
MXU/VPU lanes) and the conv-transpose lowerings — closing it means
changing channel widths (a parity break) or layout-packed tail
kernels (three Pallas spectral-core families each measured slower
than XLA's own fusion in-context, ops/pallas/fourier_unit.py). Note
cost_analysis "bytes accessed" counts VMEM-resident buffer accesses
as if they were HBM traffic (>100% of HBM peak if read as such); the
hbm_bw_pct field is reported for trend only.

Set FFC_TPU_BENCH_PROFILE=<dir> to additionally dump a jax.profiler
trace of 3 timed iterations. Set FFC_TPU_BENCH_RES=128 (default 32) to
measure the fgan128 config instead (ngf 128, ratio .5, 6 blocks — the
BASELINE.md secondary row); the driver-recorded headline metric is
always the 32px flagship.

Set FFC_TPU_BENCH_MODE=serve to measure the SERVING path instead of
training: eval-mode uint8 generation (z -> images, the exact function
the ``.ffcx`` export serializes, serving.py) K-chained under one jit —
the production-inference throughput number. Serve metrics get their own
name (``ffcganN_serve_images_per_sec``) so they never compare against
or overwrite the training baseline record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
METRIC = "ffcgan{res}_train_images_per_sec"
# reference protocol batch (fgan_complete.py:470); FFC_TPU_BENCH_BATCH
# overrides for throughput-vs-batch scaling studies (BASELINE.md)
BATCH = int(os.environ.get("FFC_TPU_BENCH_BATCH", "64"))
TPU_V5E_BF16_PEAK = 197e12  # FLOP/s
TPU_V5E_HBM_BW = 819e9  # B/s


_PREFLIGHT_CODE = (
    "import jax, jax.numpy as jnp;"
    "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready();"
    "print(jax.default_backend())"
)


def _backend_preflight(timeout_s: float):
    """Probe backend availability in a bounded subprocess.

    The axon-tunnelled TPU's failure mode is a ~25-minute block inside
    backend init followed by UNAVAILABLE (BASELINE.md round-2 tail);
    without this bound, a tunnel outage burns the driver's whole bench
    budget and records an undifferentiated rc=1 traceback
    (BENCH_r02.json). Returns (ok, detail).
    """
    code = os.environ.get("FFC_TPU_BENCH_PREFLIGHT_CODE", _PREFLIGHT_CODE)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s:.0f}s"
    if r.returncode == 0:
        return True, r.stdout.strip().splitlines()[-1] if r.stdout else ""
    tail = (r.stderr or "").strip().splitlines()
    return False, (tail[-1] if tail else f"probe rc={r.returncode}")[-300:]


def _batch_suffix() -> str:
    """Non-protocol batch sizes get a metric-name suffix so a scaling
    study can never compare against (or overwrite) the batch-64
    records — one rule shared by the train and serve paths."""
    return "" if BATCH == 64 else f"_b{BATCH}"


def _metric_name(res) -> str:
    mode = os.environ.get("FFC_TPU_BENCH_MODE", "train")
    base = (
        f"ffcgan{res}_serve_images_per_sec"
        if mode == "serve"
        else METRIC.format(res=res)
    )
    return base + _batch_suffix()


def _emit(step_time, images_per_sec, flops_step, bytes_step,
          metric_name: str, vs_baseline: float = 1.0,
          extra_stderr: dict | None = None) -> None:
    """The one result-emission path for BOTH modes: the JSON result
    line on stdout + the roofline line on stderr (a field change here
    changes every BENCH_r*.json record identically)."""
    import jax

    print(json.dumps({
        "metric": metric_name,
        "value": round(images_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(vs_baseline, 4),
    }))
    print(json.dumps({
        "step_ms": round(step_time * 1e3, 3),
        "flops_per_step": flops_step,
        "bytes_per_step": bytes_step,
        "mfu_pct_of_v5e_bf16_peak": round(
            flops_step / step_time / TPU_V5E_BF16_PEAK * 100, 2
        ),
        "hbm_bw_pct": round(
            bytes_step / step_time / TPU_V5E_HBM_BW * 100, 2
        ),
        **(extra_stderr or {}),
        "backend": jax.default_backend(),
    }), file=sys.stderr)


def main() -> None:
    # Bounded availability preflight: on an unreachable backend, emit a
    # self-describing skip marker with rc 0 so BENCH_r*.json artifacts
    # distinguish "chip down" from "code broken". FFC_TPU_BENCH_PREFLIGHT=0
    # disables (runs straight into backend init, previous behavior).
    if os.environ.get("FFC_TPU_BENCH_PREFLIGHT", "1") != "0":
        timeout_s = float(
            os.environ.get("FFC_TPU_BENCH_PREFLIGHT_TIMEOUT", "240")
        )
        ok, detail = _backend_preflight(timeout_s)
        if not ok:
            # skip marker carries the MODE-correct metric name: a
            # failed serve run must never file as a zero-value
            # training bench record
            print(json.dumps({
                "metric": _metric_name(
                    os.environ.get("FFC_TPU_BENCH_RES", "32")
                ),
                "value": 0,
                "unit": "img/s",
                "vs_baseline": 0,
                "skipped": "backend-unavailable",
                "detail": detail,
            }))
            return

    import jax
    import jax.numpy as jnp

    from fastfourierconvolution_tpu.models import (
        FFCGenerator,
        SNConvDiscriminator,
    )
    from fastfourierconvolution_tpu.train import GANTrainer
    from fastfourierconvolution_tpu.utils import policy

    # TPU-native training configuration: bf16 activations (params/BN/SN
    # state stay f32), one fused [fake; real] D forward (same math for
    # the BN-free SN discriminator), K steps chained under one jit.
    policy.set_compute_dtype("bf16")
    res = int(os.environ.get("FFC_TPU_BENCH_RES", "32"))
    K = 16 if res <= 64 else 4

    g = FFCGenerator.for_resolution(res, z_size=128)
    d = SNConvDiscriminator.for_resolution(res)
    trainer = GANTrainer(
        g, d, z_size=128, lr=2e-4, total_steps=100_000, num_dis_updates=1,
        fused_dis_batch=True,
        remat=os.environ.get("FFC_TPU_BENCH_REMAT") or None,
    )

    rng = jax.random.PRNGKey(0)
    real = jnp.asarray(
        jax.random.uniform(rng, (BATCH, res, res, 3), minval=-1.0, maxval=1.0)
    )
    state = trainer.init(rng, real)

    mode = os.environ.get("FFC_TPU_BENCH_MODE", "train")
    if mode == "serve":
        # serving path: eval-mode uint8 generation, K z-batches chained
        # under one jit (each batch's images reduced into the carry so
        # no generator work can be dead-code-eliminated)
        zs = jax.random.normal(rng, (K, BATCH, 128))

        def serve_many(state, zs):
            def body(carry, z):
                imgs = trainer.generate(state, z, uint8=True)
                return carry + imgs.astype(jnp.uint32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.uint32(0), zs)
            return tot

        compiled = jax.jit(serve_many).lower(state, zs).compile()
        ca = (
            jax.jit(lambda s, z: trainer.generate(s, z, uint8=True))
            .lower(state, zs[0]).compile().cost_analysis()
        )
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        flops_step = float(ca.get("flops", 0.0))
        bytes_step = float(ca.get("bytes accessed", 0.0))
        int(compiled(state, zs))  # warmup + host sync

        prof_dir = os.environ.get("FFC_TPU_BENCH_PROFILE")
        if prof_dir:
            # 3 timed iterations like the train path, so cross-mode
            # trace comparisons see the same steady-state window
            with jax.profiler.trace(prof_dir):
                for _ in range(3):
                    tot = compiled(state, zs)
                int(tot)

        n_calls = 15
        t0 = time.perf_counter()
        tot = 0
        for _ in range(n_calls):
            tot = compiled(state, zs)
        int(tot)  # full sync
        dt = time.perf_counter() - t0
        step_time = dt / (n_calls * K)
        images_per_sec = BATCH / step_time
        _emit(step_time, images_per_sec, flops_step, bytes_step,
              metric_name=_metric_name(res))
        return

    reals = jnp.broadcast_to(real, (K,) + real.shape)

    compiled = (
        jax.jit(trainer.update_steps, donate_argnums=0)
        .lower(state, reals)
        .compile()
    )
    # cost analysis from a single un-scanned step: XLA's while-loop cost
    # accounting does not scale with the trip count
    ca = jax.jit(trainer.update_step).lower(state, real).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    flops_step = float(ca.get("flops", 0.0))
    bytes_step = float(ca.get("bytes accessed", 0.0))

    # warmup / compile. NOTE: on the axon-tunnelled TPU,
    # block_until_ready does not reliably wait; pulling a scalar to the
    # host is the only trustworthy synchronisation.
    state, metrics = compiled(state, reals)
    float(metrics["loss_g"][-1])

    prof_dir = os.environ.get("FFC_TPU_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            for _ in range(3):
                state, metrics = compiled(state, reals)
            float(metrics["loss_g"][-1])

    n_calls = 15
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = compiled(state, reals)
    float(metrics["loss_g"][-1])  # full sync
    dt = time.perf_counter() - t0

    step_time = dt / (n_calls * K)
    images_per_sec = BATCH / step_time
    mfu = flops_step / step_time / TPU_V5E_BF16_PEAK
    hbm = bytes_step / step_time / TPU_V5E_HBM_BW

    # Real-hardware smoke of the (default-off) Pallas FourierUnit
    # kernels: compile+run both families on the chip and check numerics
    # against the jnp spec, so a Mosaic regression can't rot unnoticed
    # (interpret-mode tests alone don't exercise the TPU lowering).
    pallas_smoke = "skipped (not tpu)"
    if jax.default_backend() == "tpu":
        try:
            from fastfourierconvolution_tpu.ops.pallas import (
                fourier_unit as fu,
            )

            key = jax.random.PRNGKey(7)
            xs = jax.random.normal(key, (4, 16, 16, 16), jnp.bfloat16)
            kern = (
                jax.random.normal(key, (32, 32), jnp.bfloat16) * 0.1
            )
            ones = jnp.ones((32,), jnp.float32)
            zeros = jnp.zeros((32,), jnp.float32)
            y_ref, bm_ref, _ = fu._spec_forward(
                xs.astype(jnp.float32), kern.astype(jnp.float32),
                ones, zeros, zeros, ones, True,
            )
            errs = {}
            for mode in ("sep", "sep2", "kron"):
                y, bm, bv = fu._pallas_forward(
                    xs, kern, ones, zeros, zeros, ones, True, mode=mode
                )
                gy = jax.random.normal(key, xs.shape, xs.dtype)
                gouts = fu._pallas_backward(
                    xs, kern, ones, zeros, bm, bv, gy, True, mode=mode
                )
                jax.block_until_ready(gouts)
                rel = float(
                    jnp.abs(y.astype(jnp.float32) - y_ref).max()
                    / jnp.abs(y_ref).max()
                )
                if not rel < 2e-2:
                    raise AssertionError(f"{mode} fwd rel err {rel}")
                errs[mode] = round(rel, 5)
            pallas_smoke = f"ok {errs}"
        except Exception as e:  # noqa: BLE001 - report, don't kill bench
            pallas_smoke = f"FAILED: {type(e).__name__}: {e}"

    metric = _metric_name(res)
    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            base = json.load(open(BASELINE_FILE))
            if base.get("metric") == metric and base.get("value", 0) > 0:
                vs = images_per_sec / base["value"]
        except Exception:
            pass
    elif res == 32 and BATCH == 64:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "metric": metric,
                    "value": images_per_sec,
                    "unit": "img/s",
                    "note": "first recorded run (round 1)",
                },
                f,
            )

    _emit(step_time, images_per_sec, flops_step, bytes_step,
          metric_name=metric, vs_baseline=vs,
          extra_stderr={"pallas_smoke": pallas_smoke})


if __name__ == "__main__":
    main()
