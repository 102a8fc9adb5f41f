"""Benchmark: FFC-GAN training throughput on the flagship config.

Measures full GAN train steps (1 G update + 1 D update, hinge loss,
AdamW) of the reference protocol config — FFCGenerator 32px
(z=128, ngf=64, ratio 0.25, mg=4) vs the 7-conv SN discriminator,
batch 64 (reference fgan_complete.py:470-477) — on the default backend
(the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec, "unit": "img/s", "vs_baseline": r}

``vs_baseline`` is the ratio to the first recorded run of this benchmark
(BENCH_BASELINE.json, written on first execution) — the reference
publishes no throughput numbers (BASELINE.md), so round-over-round
improvement is measured against our own round-1 number.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
METRIC = "ffcgan32_train_images_per_sec"
BATCH = 64


def main() -> None:
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
    K = 8

    g = FFCGenerator.for_resolution(32, z_size=128)
    d = SNConvDiscriminator.for_resolution(32)
    trainer = GANTrainer(
        g, d, z_size=128, lr=2e-4, total_steps=100_000, num_dis_updates=1,
        fused_dis_batch=True,
    )

    rng = jax.random.PRNGKey(0)
    real = jnp.asarray(
        jax.random.uniform(rng, (BATCH, 32, 32, 3), minval=-1.0, maxval=1.0)
    )
    state = trainer.init(rng, real)
    reals = jnp.broadcast_to(real, (K,) + real.shape)
    step = jax.jit(trainer.update_steps, donate_argnums=0)

    # warmup / compile. NOTE: on the axon-tunnelled TPU,
    # block_until_ready does not reliably wait; pulling a scalar to the
    # host is the only trustworthy synchronisation.
    state, metrics = step(state, reals)
    float(metrics["loss_g"][-1])

    n_calls = 15
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = step(state, reals)
    float(metrics["loss_g"][-1])  # full sync
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * n_calls * K / dt

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            base = json.load(open(BASELINE_FILE))
            if base.get("metric") == METRIC and base.get("value", 0) > 0:
                vs = images_per_sec / base["value"]
        except Exception:
            pass
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "metric": METRIC,
                    "value": images_per_sec,
                    "unit": "img/s",
                    "note": "first recorded run (round 1)",
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(images_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
