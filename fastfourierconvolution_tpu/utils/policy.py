"""Mixed-precision policy.

One process-wide compute dtype for activations and matmul/conv operands
(parameters, optimizer state, BN statistics and SN vectors stay float32).
``bfloat16`` halves HBM traffic and doubles MXU throughput on TPU; the
spectral transforms inherit the policy (documented ~1e-2 relative
transform error in bf16 — irrelevant to GAN training quality, which is
why bf16 is the recommended training setting; numerics tests pin f32).

The policy is read at TRACE time: set it before jitting (the driver does,
cli.run_train). Changing it afterwards does not affect functions already
traced for a given input signature — jax caches the traced computation,
so a stale-policy trace is silently reused. Re-jit (or change input
shapes/dtypes) after flipping the policy.
"""

from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    if isinstance(dtype, str):
        dtype = {"f32": jnp.float32, "float32": jnp.float32,
                 "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}[dtype]
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def cast_compute(x):
    """Cast an activation/operand to the policy dtype."""
    if x.dtype != _COMPUTE_DTYPE and jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(_COMPUTE_DTYPE)
    return x
