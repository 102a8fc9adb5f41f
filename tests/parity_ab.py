"""A/B training-parity harness: reference vs this framework, in lockstep.

Drives the reference's own ``fgan_complete.py`` recipe — its ``FGenerator``
/ ``Discriminator`` classes exec'd from /root/reference, its hinge losses,
AdamW(0.5, 0.999) + linear LambdaLR, G-first update order (reference
fgan_complete.py:238-406) — on torch CPU, and the identical configuration
here (``GANTrainer`` + ``FFCGenerator`` + ``SNConvDiscriminator``) from
*converted identical initial weights*, *identical data batches* and
*identical latent draws* (the trainer's ``zs`` injection hook).

The one RNG-coupled component, NoiseInjection, is neutralised to identity
on BOTH sides: its weights start at zero everywhere, but its gradient is
the raw per-forward noise draw, so the first optimizer step would write
framework-specific RNG into the weights and break lockstep. Everything
else — FFC/FFT forwards, BN batch statistics, the spectral-norm power
iteration cadence (three D forwards per global step, u advancing on
each), losses, optimizers, schedules — runs live on both sides.

Usage (writes RUNS/parity_ab/):
    JAX_PLATFORMS=cpu python tests/parity_ab.py --steps 500
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_ref  # noqa: E402

Z_SIZE = 128
LR = 2e-4


def make_batches(steps: int, batch: int, size: int, seed: int = 0):
    """(steps, B, H, W, C) float32 in [-1, 1] from the shapes dataset,
    sequential epochs over a seed-shuffled order (the reference loader's
    shuffle + drop_last contract, fgan_complete.py:258)."""
    from fastfourierconvolution_tpu.data.datasets import ShapesDataset

    n = max(batch * 8, 256)
    ds = ShapesDataset(n=n, size=size, seed=2020)
    imgs = ds.images.astype(np.float32) / 255.0 * 2.0 - 1.0
    rng = np.random.RandomState(seed)
    out = np.empty((steps, batch) + imgs.shape[1:], np.float32)
    i, order = 0, rng.permutation(n)
    for s in range(steps):
        if i + batch > n:
            order, i = rng.permutation(n), 0
        out[s] = imgs[order[i:i + batch]]
        i += batch
    return out


def make_zs(steps: int, batch: int, num_dis_updates: int = 1, seed: int = 7):
    """(steps, 1+num_dis_updates, B, Z): [s, 0] feeds the G update,
    [s, 1:] the D updates — shared verbatim by both loops."""
    rng = np.random.RandomState(seed)
    return rng.randn(steps, 1 + num_dis_updates, batch, Z_SIZE).astype(
        np.float32
    )


def init_reference_nets(mg: int, seed: int = 0):
    """Reference FGenerator/Discriminator, weights_init'd exactly as the
    reference does (fgan_complete.py:22-31, 300-307). Returns
    (G, D, state dicts) with NoiseInjection patched to identity."""
    import torch
    import torch.nn as nn

    ns = torch_ref.install_reference_repo()
    import layers  # reference package

    layers.NoiseInjection.forward = lambda self, x: x

    def weights_init(m):  # reference fgan_complete.py:22-31
        classname = m.__class__.__name__
        if classname.find("Conv") != -1:
            nn.init.normal_(m.weight.data, 0.0, 0.02)
        elif classname.find("BatchNorm") != -1:
            nn.init.normal_(m.weight.data, 1.0, 0.02)
            nn.init.constant_(m.bias.data, 0)

    torch.manual_seed(seed)
    G = ns["FGenerator"](Z_SIZE, mg=mg).train()
    G.apply(weights_init)
    D = ns["Discriminator"](sn=True, mg=mg).train()
    D.apply(weights_init)
    return G, D


def run_reference_loop(G, D, batches, zs, total_steps: int):
    """The fgan_complete.py:357-406 hot loop, verbatim semantics."""
    import torch
    import torch.nn.functional as F

    steps, batch = batches.shape[0], batches.shape[1]
    num_dis_updates = zs.shape[1] - 1
    optim_G = torch.optim.AdamW(G.parameters(), lr=LR, betas=(0.5, 0.999))
    optim_D = torch.optim.AdamW(D.parameters(), lr=LR, betas=(0.5, 0.999))
    sched_G = torch.optim.lr_scheduler.LambdaLR(
        optim_G, lambda step: 1.0 - step / total_steps
    )
    sched_D = torch.optim.lr_scheduler.LambdaLR(
        optim_D, lambda step: 1.0 - step / total_steps
    )
    loss_g_hist, loss_d_hist = [], []
    for step in range(steps):
        real_img = torch.from_numpy(
            batches[step].transpose(0, 3, 1, 2).copy()
        )
        G.requires_grad_(True)
        D.requires_grad_(False)
        z = torch.from_numpy(zs[step, 0])
        optim_D.zero_grad()
        optim_G.zero_grad()
        fake = G(z)
        loss_G = -D(fake).mean()  # hinge_loss_gen, fgan_complete.py:231-235
        loss_G.backward()
        optim_G.step()

        G.requires_grad_(False)
        D.requires_grad_(True)
        for d_iter in range(num_dis_updates):
            z = torch.from_numpy(zs[step, 1 + d_iter])
            optim_D.zero_grad()
            optim_G.zero_grad()
            fake = G(z)
            output_dg = D(fake)
            output_dreal = D(real_img)
            loss_D = (  # hinge_loss_dis, fgan_complete.py:216-222
                F.relu(1.0 - output_dreal).mean()
                + F.relu(1.0 + output_dg).mean()
            )
            loss_D.backward()
            optim_D.step()
        sched_G.step()
        sched_D.step()
        loss_g_hist.append(float(loss_G.detach()))
        loss_d_hist.append(float(loss_D.detach()))
    return {"loss_g": loss_g_hist, "loss_d": loss_d_hist}


@contextlib.contextmanager
def _no_noise_injection():
    """Patch this framework's NoiseInjection to identity (see module
    docstring). The patched module creates no params, so converted trees
    must drop the (all-zero) lcl/glb_noise entries."""
    import flax.linen as nn

    import fastfourierconvolution_tpu.models.ffc_gan as fg

    class _Identity(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    orig = fg.NoiseInjection
    fg.NoiseInjection = _Identity
    try:
        yield
    finally:
        fg.NoiseInjection = orig


def run_ours_loop(sd_g, sd_d, batches, zs, total_steps: int, mg: int,
                  sample_z=None):
    """Same recipe through GANTrainer from the converted torch init."""
    import jax
    import jax.numpy as jnp

    from fastfourierconvolution_tpu.compat import (
        convert_fgan_generator,
        convert_sn_discriminator,
    )
    from fastfourierconvolution_tpu.models.ffc_gan import (
        _D_LADDERS,
        FFCGenerator,
        SNConvDiscriminator,
    )
    from fastfourierconvolution_tpu.train.gan import (
        GANState,
        GANTrainer,
        NetState,
    )

    steps, batch = batches.shape[0], batches.shape[1]
    size = batches.shape[2]
    num_dis_updates = zs.shape[1] - 1

    with _no_noise_injection():
        g_model = FFCGenerator.for_resolution(size, z_size=Z_SIZE, mg=mg)
        d_model = SNConvDiscriminator(ladder=_D_LADDERS[32], mg=mg)
        trainer = GANTrainer(
            g_model, d_model, z_size=Z_SIZE, lr=LR,
            total_steps=total_steps, num_dis_updates=num_dis_updates,
        )
        g_vars = convert_fgan_generator(sd_g, mg=mg)
        d_vars = convert_sn_discriminator(sd_d, mg=mg)
        g_params = {
            k: v for k, v in g_vars["params"].items()
            if not ("noise" in k and k != "noise_to_feature")
        }
        state = GANState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(
                params=g_params,
                batch_stats=g_vars["batch_stats"],
                spectral=None,
                opt_state=trainer.g_tx.init(g_params),
            ),
            d=NetState(
                params=d_vars["params"],
                batch_stats=None,
                spectral=d_vars["spectral"],
                opt_state=trainer.d_tx.init(d_vars["params"]),
            ),
            rng=jax.random.PRNGKey(0),
        )
        step_fn = jax.jit(
            lambda s, r, z: trainer.update_step(s, r, zs=z)
        )
        loss_g_hist, loss_d_hist = [], []
        for s in range(steps):
            state, m = step_fn(
                state, jnp.asarray(batches[s]), jnp.asarray(zs[s])
            )
            loss_g_hist.append(float(m["loss_g"]))
            loss_d_hist.append(float(m["loss_d"]))
        out = {"loss_g": loss_g_hist, "loss_d": loss_d_hist}
        if sample_z is not None:
            out["samples"] = np.asarray(
                trainer.generate(state, jnp.asarray(sample_z), uint8=True)
            )
    return out


def reference_eval_samples(G, z):
    import torch

    G.eval()
    with torch.no_grad():
        out = G(torch.from_numpy(z)).numpy()  # uint8 NCHW
    G.train()
    return out.transpose(0, 2, 3, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mg", type=int, default=2)
    ap.add_argument("--out", default="RUNS/parity_ab")
    args = ap.parse_args()
    size = args.mg * 8  # 3-block ladder
    os.makedirs(args.out, exist_ok=True)

    batches = make_batches(args.steps, args.batch, size)
    zs = make_zs(args.steps, args.batch)
    sample_z = np.random.RandomState(42).randn(64, Z_SIZE).astype(np.float32)

    G, D = init_reference_nets(args.mg)
    sd_g = {k: v.clone() for k, v in G.state_dict().items()}
    sd_d = {k: v.clone() for k, v in D.state_dict().items()}

    print(f"[parity_ab] reference loop: {args.steps} steps ...")
    ref = run_reference_loop(G, D, batches, zs, total_steps=args.steps)
    ref_samples = reference_eval_samples(G, sample_z)

    print(f"[parity_ab] ours: {args.steps} steps ...")
    ours = run_ours_loop(
        sd_g, sd_d, batches, zs, total_steps=args.steps, mg=args.mg,
        sample_z=sample_z,
    )

    lg_r, lg_o = np.array(ref["loss_g"]), np.array(ours["loss_g"])
    ld_r, ld_o = np.array(ref["loss_d"]), np.array(ours["loss_d"])
    # GAN training is chaotic: f32 accumulation-order noise (~1e-6)
    # amplifies ~2-3x per step, so exact lockstep holds for the first
    # ~10 steps and the long-run comparison is statistical — windowed
    # trajectory means must land in the same regime.
    quarters = [
        (lo, hi) for lo, hi in (
            (0, args.steps // 4),
            (args.steps // 4, args.steps // 2),
            (args.steps // 2, 3 * args.steps // 4),
            (3 * args.steps // 4, args.steps),
        )
    ]
    summary = {
        "steps": args.steps,
        "batch": args.batch,
        "mg": args.mg,
        "max_abs_dloss_first10": float(np.abs(ld_r[:10] - ld_o[:10]).max()),
        "max_abs_gloss_first10": float(np.abs(lg_r[:10] - lg_o[:10]).max()),
        "windowed_mean_dloss": [
            {"window": [lo, hi], "reference": float(ld_r[lo:hi].mean()),
             "ours": float(ld_o[lo:hi].mean())}
            for lo, hi in quarters
        ],
        "windowed_mean_gloss": [
            {"window": [lo, hi], "reference": float(lg_r[lo:hi].mean()),
             "ours": float(lg_o[lo:hi].mean())}
            for lo, hi in quarters
        ],
        "mean_abs_dloss_all": float(np.abs(ld_r - ld_o).mean()),
        "final_dloss": [float(ld_r[-1]), float(ld_o[-1])],
        "final_gloss": [float(lg_r[-1]), float(lg_o[-1])],
    }
    with open(os.path.join(args.out, "losses.json"), "w") as f:
        json.dump(
            {"summary": summary, "reference": ref,
             "ours": {k: v for k, v in ours.items() if k != "samples"}},
            f, indent=1,
        )
    print(json.dumps(summary, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for ax, (r, o, title) in zip(
        axes,
        [(lg_r, lg_o, "loss_G"), (ld_r, ld_o, "loss_D")],
    ):
        ax.plot(r, label="reference (torch)", alpha=0.8, lw=0.8)
        ax.plot(o, label="ours (jax)", alpha=0.8, lw=0.8)
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=120)

    # end-state sample grids, shared eval z
    ours_samples = ours["samples"]
    grid = np.concatenate(
        [
            np.concatenate(list(ref_samples[:8]), axis=1),
            np.concatenate(list(ours_samples[:8]), axis=1),
        ],
        axis=0,
    )
    plt.figure(figsize=(12, 3))
    plt.imshow(grid)
    plt.axis("off")
    plt.title("top: reference end-state samples / bottom: ours (shared z)")
    plt.savefig(
        os.path.join(args.out, "samples_ab.png"), dpi=120,
        bbox_inches="tight",
    )
    diff = np.abs(
        ref_samples.astype(int) - ours_samples.astype(int)
    )
    print(
        f"[parity_ab] end-state sample uint8 diff: mean {diff.mean():.2f} "
        f"max {diff.max()}"
    )
    with open(os.path.join(args.out, "samples_diff.json"), "w") as f:
        json.dump(
            {"mean_abs_uint8_diff": float(diff.mean()),
             "max_abs_uint8_diff": int(diff.max())}, f,
        )


if __name__ == "__main__":
    main()
