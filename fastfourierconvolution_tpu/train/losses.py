"""GAN losses: hinge, BCE, Wasserstein(+GP), and the aw-method.

Behavioral contracts from the reference:
  * hinge: ``relu(1-real).mean() + relu(1+fake).mean()`` for D,
    ``-fake.mean()`` for G (reference fgan_complete.py:216-235);
  * BCE: classic DCGAN criterion on sigmoid outputs
    (reference train_cond.py:15,166-220);
  * wgan-gp: the SAGAN comparator's alternative objective
    (reference benchmark_models/sagan/trainer.py:130-152);
  * aw_loss: adaptive gradient re-weighting of the real/fake D gradients
    (reference layers/aw_loss.py:13-107 — exported but unused there; here
    it is a usable combiner over separately computed grad pytrees).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.flatten_util  # noqa: F401  (registers jax.flatten_util)
import jax.numpy as jnp


# --- hinge ------------------------------------------------------------------


def hinge_loss_dis(fake_logits: jax.Array, real_logits: jax.Array) -> jax.Array:
    assert fake_logits.ndim == 2 and fake_logits.shape[1] == 1, fake_logits.shape
    assert real_logits.shape == fake_logits.shape
    fake_logits = fake_logits.astype(jnp.float32)
    real_logits = real_logits.astype(jnp.float32)
    return (
        jnp.mean(jax.nn.relu(1.0 - real_logits))
        + jnp.mean(jax.nn.relu(1.0 + fake_logits))
    )


def hinge_loss_gen(fake_logits: jax.Array) -> jax.Array:
    assert fake_logits.ndim == 2 and fake_logits.shape[1] == 1, fake_logits.shape
    return -jnp.mean(fake_logits.astype(jnp.float32))


# --- BCE (classic DCGAN) ----------------------------------------------------


def bce_loss(probs: jax.Array, target: float) -> jax.Array:
    """Binary cross-entropy on probabilities (the reference's nn.BCELoss
    applied to sigmoid-headed discriminators)."""
    probs = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    t = jnp.full_like(probs, target)
    return -jnp.mean(t * jnp.log(probs) + (1.0 - t) * jnp.log(1.0 - probs))


def bce_loss_dis(fake_probs: jax.Array, real_probs: jax.Array) -> jax.Array:
    return bce_loss(real_probs, 1.0) + bce_loss(fake_probs, 0.0)


def bce_loss_gen(fake_probs: jax.Array) -> jax.Array:
    return bce_loss(fake_probs, 1.0)


# --- Wasserstein + gradient penalty ----------------------------------------


def wgan_loss_dis(fake_logits: jax.Array, real_logits: jax.Array) -> jax.Array:
    return jnp.mean(fake_logits.astype(jnp.float32)) - jnp.mean(
        real_logits.astype(jnp.float32)
    )


def wgan_loss_gen(fake_logits: jax.Array) -> jax.Array:
    return -jnp.mean(fake_logits.astype(jnp.float32))


def gradient_penalty(
    d_apply, real: jax.Array, fake: jax.Array, rng: jax.Array
) -> jax.Array:
    """WGAN-GP penalty: E[(||grad_x D(x_hat)|| - 1)^2] on interpolates.

    ``d_apply(x) -> (B, 1)`` must close over params/state.
    """
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
    x_hat = eps * real + (1.0 - eps) * fake

    grads = jax.grad(lambda x: jnp.sum(d_apply(x)))(x_hat)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


# --- aw-method (adaptive weighting of D's real/fake gradients) -------------


def aw_combine(
    grads_real,
    grads_fake,
    real_logits: jax.Array,
    fake_logits: jax.Array,
    alpha1: float = 0.5,
    alpha2: float = 0.75,
    delta: float = 0.05,
    epsilon: float = 0.05,
    normalized: bool = True,
) -> Tuple[object, jax.Array, jax.Array]:
    """aw-method gradient combination (reference layers/aw_loss.py:13-107).

    The reference computes real/fake D gradients with two separate
    ``backward(retain_graph=True)`` passes and overwrites ``param.grad``
    with ``w_r*g_real + w_f*g_fake``; here the caller supplies the two
    gradient pytrees (two ``jax.grad`` calls) and receives the combined
    pytree. Weight selection (Algorithm 1 normalized / Algorithm 2 not):

      rs < alpha1 or rs < fs - delta  (real side losing):
          rdotf <= 0:  w_r = 1/r_norm + eps, w_f = -rdotf/(fdotf*r_norm) + eps
          rdotf  > 0:  w_r = 1/r_norm + eps, w_f = eps
      rs > alpha2 and rs > fs - delta (real side winning): mirrored
      otherwise: w_r = 1/r_norm + eps, w_f = 1/f_norm + eps

    ``real_logits``/``fake_logits`` are raw D outputs — scores are their
    mean sigmoids, as in the reference.
    """
    assert alpha1 < alpha2, "alpha1 must be strictly smaller than alpha2"
    r_flat, unravel = jax.flatten_util.ravel_pytree(grads_real)
    f_flat, _ = jax.flatten_util.ravel_pytree(grads_fake)
    rdotr = jnp.dot(r_flat, r_flat) + 1e-4
    fdotf = jnp.dot(f_flat, f_flat) + 1e-4
    rdotf = jnp.dot(r_flat, f_flat)
    r_norm = jnp.sqrt(rdotr)
    f_norm = jnp.sqrt(fdotf)

    rs = jnp.mean(jax.nn.sigmoid(real_logits))
    fs = jnp.mean(jax.nn.sigmoid(fake_logits))

    real_losing = jnp.logical_or(rs < alpha1, rs < fs - delta)
    real_winning = jnp.logical_and(rs > alpha2, rs > fs - delta)
    neg = rdotf <= 0

    if normalized:
        w_r_lose = 1.0 / r_norm + epsilon
        w_f_lose = jnp.where(neg, -rdotf / (fdotf * r_norm) + epsilon, epsilon)
        w_r_win = jnp.where(neg, -rdotf / (rdotr * f_norm) + epsilon, epsilon)
        w_f_win = 1.0 / f_norm + epsilon
        w_r_mid = 1.0 / r_norm + epsilon
        w_f_mid = 1.0 / f_norm + epsilon
    else:
        w_r_lose = 1.0 + epsilon
        w_f_lose = jnp.where(neg, -rdotf / fdotf + epsilon, epsilon)
        w_r_win = jnp.where(neg, -rdotf / rdotr + epsilon, epsilon)
        w_f_win = 1.0 + epsilon
        w_r_mid = 1.0 + epsilon
        w_f_mid = 1.0 + epsilon

    w_r = jnp.where(real_losing, w_r_lose, jnp.where(real_winning, w_r_win, w_r_mid))
    w_f = jnp.where(real_losing, w_f_lose, jnp.where(real_winning, w_f_win, w_f_mid))

    combined = unravel(w_r * r_flat + w_f * f_flat)
    return combined, w_r, w_f
