"""Spectral normalisation as a pure functional transform.

Reference semantics (torch.nn.utils.spectral_norm, used on every
discriminator conv/linear, e.g. reference fgan_complete.py:148-156; the
explicit algorithm also appears at
reference benchmark_models/sagan/spectral.py:23-35):

  * the weight is reshaped to a (rows, cols) matrix with rows = output
    channels,
  * a persistent left singular vector estimate ``u`` is refined by one
    power iteration per *training* forward:
        v = normalize(W^T u);  u = normalize(W v)
  * sigma = u^T W v, and the applied weight is W / sigma,
  * at eval time the stored ``u`` is used without iteration.

Here the iteration is a pure function: it takes ``u`` and returns the
normalised weight plus the updated ``u`` for the caller to carry in its
state (a flax variable collection in the nn layer). Gradients do not flow
through the power iteration (``stop_gradient`` on u/v), matching torch's
treatment of u/v as buffers — but DO flow through ``w / sigma`` itself,
including sigma's dependence on w, matching torch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2_normalize(v: jax.Array, eps: float = _EPS) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def matrix_view(w: jax.Array) -> jax.Array:
    """Reshape a kernel to the (out_features, -1) matrix SN operates on.

    Dense kernels are (in, out) in this framework; conv kernels are HWIO.
    Both put the output dimension last, so the matrix view is
    ``w.reshape(-1, out).T`` — rows = output features, matching torch's
    ``w.view(out, -1)`` up to a column permutation (which leaves singular
    values unchanged).
    """
    out = w.shape[-1]
    return w.reshape(-1, out).T


def power_iteration(
    w_mat: jax.Array, u: jax.Array, n_steps: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run ``n_steps`` power iterations; returns (sigma, u_new, v).

    ``w_mat``: (rows, cols); ``u``: (rows,). u/v are treated as constants
    for differentiation (stop_gradient), like torch buffers.
    """
    w_stopped = jax.lax.stop_gradient(w_mat)
    v = None
    for _ in range(n_steps):
        v = _l2_normalize(w_stopped.T @ u)
        u = _l2_normalize(w_stopped @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w_mat @ v)  # grads flow through w_mat here
    return sigma, u, v


def spectral_normalize(
    w: jax.Array, u: jax.Array, update: bool, n_steps: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Return (w / sigma, u_new).

    ``update=True`` (training): run ``n_steps`` power iterations and
    return the refined ``u``. ``update=False`` (eval): use the stored
    ``u`` as-is, with v recomputed once from it (torch eval semantics:
    sigma from stored u/v; recomputing v from the stored u is the
    do-not-mutate equivalent and identical at convergence).
    """
    w_mat = matrix_view(w)
    if update:
        sigma, u_new, _ = power_iteration(w_mat, u, n_steps)
    else:
        w_stopped = jax.lax.stop_gradient(w_mat)
        v = _l2_normalize(w_stopped.T @ u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        u_new = u
    return w / sigma, u_new
