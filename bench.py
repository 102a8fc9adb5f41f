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

    g = FFCGenerator.for_resolution(32, z_size=128)
    d = SNConvDiscriminator.for_resolution(32)
    trainer = GANTrainer(
        g, d, z_size=128, lr=2e-4, total_steps=100_000, num_dis_updates=1
    )

    rng = jax.random.PRNGKey(0)
    real = jnp.asarray(
        jax.random.uniform(rng, (BATCH, 32, 32, 3), minval=-1.0, maxval=1.0)
    )
    state = trainer.init(rng, real)
    step = jax.jit(trainer.update_step, donate_argnums=0)

    # warmup / compile
    state, metrics = step(state, real)
    jax.block_until_ready(metrics)

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, real)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * n_steps / dt

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
