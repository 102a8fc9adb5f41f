"""Unified driver: train / sample / fidelity.

One binary with presets replaces the reference's seven cloned training
scripts and standalone test/fidelity CLIs (SURVEY §2.3):

  python -m fastfourierconvolution_tpu.cli train --preset fgan32 ...
  python -m fastfourierconvolution_tpu.cli sample --preset fgan32 ...
  python -m fastfourierconvolution_tpu.cli fidelity --set ...

Training loop contract (reference fgan_complete.py:357-460): jitted
G+D update per step, scalar logs every ``log_every``, eval every
``num_epoch_steps`` (metrics + fixed-z sample grid), checkpoints after
``checkpoint_after_frac`` of training, resume from latest.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np


def run_train(cfg) -> None:
    import jax
    import jax.numpy as jnp
    import tqdm

    from .data import DataLoader, load_dataset
    from .eval import GenerativeModel, calculate_metrics
    from .models import to_uint8
    from .parallel import batch_sharding, make_mesh, state_shardings
    from .train import GANTrainer
    from .train.checkpoint import restore_latest, save_checkpoint
    from .utils.logging import ScalarLogger, save_image_grid, save_loss_plot
    from .zoo import build_models

    from .utils import policy

    t = cfg.train
    policy.set_compute_dtype(t.precision)
    g_model, d_model = build_models(cfg)
    # fused [fake; real] D pass is numerics-identical only for BN-free
    # discriminators (the SN conv families)
    fused = cfg.model.discriminator in ("sn_conv", "cond_sn_conv", "sn_dcgan")
    trainer = GANTrainer(
        g_model,
        d_model,
        z_size=cfg.model.z_size,
        lr=t.lr,
        d_lr=t.d_lr,
        total_steps=t.num_total_steps,
        num_dis_updates=t.num_dis_updates,
        loss=t.loss,
        optimizer=t.optimizer,
        b1=t.beta1,
        b2=t.beta2,
        conditional=cfg.model.conditional,
        num_classes=cfg.model.num_classes,
        fused_dis_batch=fused,
    )

    dataset = load_dataset(
        cfg.data.dataset,
        cfg.data.data_dir,
        cfg.data.image_size,
        cfg.data.channels,
        hflip_augment=cfg.data.hflip_augment,
    )
    loader = DataLoader(dataset, t.batch_size, seed=t.seed)
    batches = loader.epochs()

    # register the eval-side real set (reference register_dataset,
    # util/data_loader.py:65-80: e.g. 'svhn-32') and use it as input2
    if (cfg.eval.fid or cfg.eval.kid) and cfg.eval.input2_dataset is None:
        from .eval import register_dataset as register_eval_dataset

        name = f"{cfg.data.dataset}-{cfg.data.image_size}"

        def _load_real(n=cfg.eval.num_samples_for_metrics):
            take = min(n, len(dataset))
            imgs = np.stack([dataset[i][0] for i in range(take)])
            if imgs.shape[-1] == 1:  # grayscale -> RGB for the extractor
                imgs = np.repeat(imgs, 3, axis=-1)
            return imgs

        register_eval_dataset(name, _load_real)
        cfg.eval.input2_dataset = name

    rng = jax.random.PRNGKey(t.seed)
    sample = jnp.zeros(
        (t.batch_size, cfg.data.image_size, cfg.data.image_size,
         cfg.data.channels),
        jnp.float32,
    )
    state = trainer.init(rng, sample)

    # data-parallel over every visible device
    mesh = make_mesh()
    s_shard = state_shardings(mesh, state, trainer.g_tx, trainer.d_tx)
    b_shard = batch_sharding(mesh)
    state = jax.device_put(state, s_shard)
    if cfg.model.conditional:
        step_fn = jax.jit(
            trainer.update_step,
            in_shardings=(s_shard, b_shard, b_shard),
            out_shardings=(s_shard, None),
            donate_argnums=0,
        )
    else:
        step_fn = jax.jit(
            trainer.update_step,
            in_shardings=(s_shard, b_shard),
            out_shardings=(s_shard, None),
            donate_argnums=0,
        )

    ckpt_dir = os.path.join(cfg.log.dir_logs, "checkpoints")
    ini_step = 0
    if cfg.log.checkpoint:
        state_restored, ini_step = restore_latest(state, ckpt_dir)
        if ini_step:
            state = jax.device_put(state_restored, s_shard)
            print(f"INFO: resumed from step {ini_step}")

    logger = ScalarLogger(cfg.log.dir_logs)
    z_vis = jax.random.normal(
        jax.random.PRNGKey(1234), (cfg.log.samples_grid, cfg.model.z_size)
    )
    y_vis = (
        jnp.arange(cfg.log.samples_grid) % max(cfg.model.num_classes, 1)
        if cfg.model.conditional
        else None
    )

    pbar = tqdm.tqdm(
        total=t.num_total_steps, initial=ini_step, desc="Training",
        unit="batch",
    )
    lr_of = lambda s: t.lr * max(0.0, 1.0 - s / t.num_total_steps)
    for step in range(ini_step, t.num_total_steps):
        real, labels = next(batches)
        real = jax.device_put(jnp.asarray(real), b_shard)
        if cfg.model.conditional:
            labels = jax.device_put(jnp.asarray(labels), b_shard)
            state, metrics = step_fn(state, real, labels)
        else:
            state, metrics = step_fn(state, real)

        if (step + 1) % cfg.log.log_every == 0:
            scal = {
                "loss_g": float(metrics["loss_g"]),
                "loss_d": float(metrics["loss_d"]),
                "lr": lr_of(step),
            }
            pbar.set_postfix(scal)
            logger.log(step, scal)
        pbar.update(1)

        next_step = step + 1
        if next_step % t.num_epoch_steps != 0:
            continue

        # ---- eval block -------------------------------------------------
        logger.flush()
        if cfg.eval.isc or cfg.eval.fid or cfg.eval.kid:
            try:
                def _gen_uint8(z, labels=None):
                    out = to_uint8(trainer.generate(state, z, labels))
                    if out.shape[-1] == 1:
                        # grayscale -> RGB repeat, the reference's
                        # reshape_output contract
                        # (models/conditional/ffc_cond_generator.py:96-114)
                        import jax.numpy as jnp

                        out = jnp.repeat(out, 3, axis=-1)
                    return out

                gm = GenerativeModel(
                    apply=_gen_uint8,
                    z_size=cfg.model.z_size,
                    num_classes=(
                        cfg.model.num_classes if cfg.model.conditional else 0
                    ),
                )
                input2 = cfg.eval.input2_dataset
                metrics_out = calculate_metrics(
                    gm,
                    input2,
                    isc=cfg.eval.isc,
                    fid=cfg.eval.fid and input2 is not None,
                    kid=cfg.eval.kid and input2 is not None,
                    input1_model_num_samples=cfg.eval.num_samples_for_metrics,
                    batch_size=min(t.batch_size, 128),
                )
                print(f"step {next_step} metrics: {metrics_out}")
                logger.log(next_step, {f"metrics/{k}": v for k, v in metrics_out.items()})
            except Exception as e:  # metrics must never kill training
                print(f"WARNING: metrics failed: {e}")

        grid = np.asarray(trainer.generate(state, z_vis, y_vis))
        save_image_grid(
            grid, os.path.join(cfg.log.dir_logs, f"{next_step:06d}.png")
        )

        if (
            cfg.log.checkpoint
            and next_step > t.num_total_steps * cfg.log.checkpoint_after_frac
        ):
            host_state = jax.device_get(state)
            save_checkpoint(host_state, ckpt_dir, next_step)

    pbar.close()
    logger.close()
    if cfg.log.loss_csv and os.path.exists(logger.csv_path):
        try:
            save_loss_plot(logger.csv_path)
        except Exception as e:
            print(f"WARNING: loss plot failed: {e}")
    print("Training finished.")


def run_sample(cfg, num_samples: int = 64) -> None:
    """Checkpoint -> PNG samples (reference test.py / test_cond.py:
    class-stratified when conditional, uint8 convention)."""
    import jax
    import jax.numpy as jnp

    from .models import to_uint8
    from .train import GANTrainer
    from .train.checkpoint import restore_latest
    from .utils.logging import save_image_grid
    from .zoo import build_models

    g_model, d_model = build_models(cfg)
    trainer = GANTrainer(
        g_model,
        d_model,
        z_size=cfg.model.z_size,
        total_steps=cfg.train.num_total_steps,
        conditional=cfg.model.conditional,
        num_classes=cfg.model.num_classes,
        loss=cfg.train.loss,
        optimizer=cfg.train.optimizer,
    )
    sample = jnp.zeros(
        (8, cfg.data.image_size, cfg.data.image_size, cfg.data.channels)
    )
    state = trainer.init(jax.random.PRNGKey(0), sample)
    ckpt_dir = os.path.join(cfg.log.dir_logs, "checkpoints")
    state, step = restore_latest(state, ckpt_dir)
    print(f"INFO: sampling from step {step}")

    z = jax.random.normal(jax.random.PRNGKey(7), (num_samples, cfg.model.z_size))
    if cfg.model.conditional:
        # class-stratified: num_per_class = n // num_classes (test_cond.py:130-135)
        labels = jnp.arange(num_samples) // max(
            1, num_samples // cfg.model.num_classes
        )
        labels = jnp.clip(labels, 0, cfg.model.num_classes - 1)
        imgs = trainer.generate(state, z, labels, uint8=True)
    else:
        imgs = trainer.generate(state, z, uint8=True)
    out = os.path.join(cfg.log.dir_logs, f"samples_{step:06d}.png")
    save_image_grid(np.asarray(imgs), out)
    print(f"saved {out}")


def run_fidelity(cfg) -> None:
    """Standalone metric computation between two registered inputs —
    the reference's ``fidelity`` CLI (torch_fidelity/fidelity.py)."""
    from .eval import calculate_metrics

    input1 = os.environ.get("FFC_TPU_INPUT1", "")
    input2 = os.environ.get("FFC_TPU_INPUT2", "") or None
    out = calculate_metrics(
        input1,
        input2,
        isc=cfg.eval.isc,
        fid=cfg.eval.fid and input2 is not None,
        kid=cfg.eval.kid and input2 is not None,
        verbose=True,
    )
    print(out)


def main(argv: Optional[list] = None) -> None:
    from .utils.config import parse_cli

    command, cfg = parse_cli(argv)
    print("Configuration:\n" + cfg.to_json())
    if command == "train":
        run_train(cfg)
    elif command == "sample":
        run_sample(cfg)
    elif command == "fidelity":
        run_fidelity(cfg)


if __name__ == "__main__":
    main()
