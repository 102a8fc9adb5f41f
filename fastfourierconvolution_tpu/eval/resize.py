"""TF1-exact bilinear resize — the FID-parity-critical op.

Replicates TensorFlow 1.x ``resize_bilinear`` semantics (the behavior
torch-fidelity reproduces in
reference torch_fidelity/interpolate_compat_tensorflow.py:8-145):

  align_corners=False:  scale = in/out,        src = out_idx * scale
  align_corners=True:   scale = (in-1)/(out-1), src = out_idx * scale
  lo = floor(src); hi = min(lo+1, in-1); lerp by (src - lo)

TPU-native formulation: bilinear resize is separable and linear, so it is
computed as two small dense matmuls ``W_h @ x @ W_w^T`` with precomputed
(out, in) weight matrices — exact (each row holds the two lerp weights)
and MXU-resident, instead of the reference's gather-based path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) row-stochastic lerp weights for one axis."""
    if align_corners:
        scale = (in_size - 1) / max(1, out_size - 1)
    else:
        scale = in_size / out_size
    idx = np.arange(out_size, dtype=np.float64)
    # The reference computes src on float32 grids; match that rounding.
    src = (idx * np.float32(scale)).astype(np.float32)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    w[np.arange(out_size), lo] += 1.0 - frac
    w[np.arange(out_size), hi] += frac
    return w.astype(np.float32)


def resize_bilinear_tf1(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Resize NHWC ``x`` to spatial ``size`` with TF1 bilinear semantics."""
    out_h, out_w = size
    in_h, in_w = x.shape[1], x.shape[2]
    # float inputs keep their dtype (the f64 internal_dtype path resizes
    # in f64 like the reference, which casts before resizing —
    # feature_extractor_inceptionv3.py:108-115); everything else (uint8)
    # computes in f32
    dtype = (
        x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    )
    wh = jnp.asarray(_resize_matrix(in_h, out_h, align_corners), dtype)
    ww = jnp.asarray(_resize_matrix(in_w, out_w, align_corners), dtype)
    ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    x = ein("oh,bhwc->bowc", wh, x.astype(dtype))
    return ein("pw,bhwc->bhpc", ww, x)
