"""Perceptual Path Length + the noise/interpolation registry.

Reference protocol (torch_fidelity/metric_ppl.py:20-142, noise.py:4-45):
paired latents (e0, e1) with e1 = interp(e0, e1', epsilon); LPIPS between
G(e0) and G(e1) divided by epsilon^2; 1-99 percentile filtering; noise
sources normal / unit / uniform_0_1; interpolation lerp / slerp_any /
slerp_unit.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import GenerativeModel

KEY_PPL_MEAN = "perceptual_path_length_mean"
KEY_PPL_STD = "perceptual_path_length_std"
KEY_PPL_RAW = "perceptual_path_length_raw"


def _normalize_last(v, eps=1e-7):
    n = jnp.sqrt(jnp.sum(v**2, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps)


def sample_random(rng: np.random.RandomState, shape, z_type: str) -> np.ndarray:
    if z_type == "normal":
        return rng.randn(*shape).astype(np.float32)
    if z_type == "unit":
        # normalized UNIFORM noise (reference noise.py random_unit)
        v = rng.rand(*shape).astype(np.float32)
        n = np.sqrt(np.sum(v**2, axis=-1, keepdims=True))
        return v / np.maximum(n, 1e-7)
    if z_type == "uniform_0_1":
        return rng.rand(*shape).astype(np.float32)
    raise ValueError(z_type)


def batch_lerp(a, b, t):
    return a + (b - a) * t


def batch_slerp_any(a, b, t, eps=1e-7):
    a_1 = _normalize_last(a, eps)
    b_1 = _normalize_last(b, eps)
    d = jnp.sum(a_1 * b_1, axis=-1, keepdims=True)
    zero = (
        jnp.linalg.norm(a_1, axis=-1, keepdims=True) < eps
    ) | (jnp.linalg.norm(b_1, axis=-1, keepdims=True) < eps)
    collinear = (d > 1 - eps) | (d < -1 + eps)
    use_lerp = zero | collinear
    omega = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    denom = jnp.maximum(jnp.sin(omega), eps)
    out = (jnp.sin((1 - t) * omega) / denom) * a + (
        jnp.sin(t * omega) / denom
    ) * b
    return jnp.where(use_lerp, batch_lerp(a, b, t), out)


def batch_slerp_unit(a, b, t, eps=1e-7):
    return _normalize_last(batch_slerp_any(a, b, t, eps), eps)


INTERPOLATIONS: Dict[str, Callable] = {
    "lerp": batch_lerp,
    "slerp_any": batch_slerp_any,
    "slerp_unit": batch_slerp_unit,
}


def calculate_ppl(
    model: GenerativeModel,
    num_samples: int = 10000,
    epsilon: float = 1e-4,
    interp: str = "lerp",
    batch_size: int = 64,
    similarity_resize: Optional[int] = 64,
    discard_percentile_lower: Optional[float] = 1.0,
    discard_percentile_higher: Optional[float] = 99.0,
    rng_seed: int = 2020,
    lpips_weights: Optional[str] = None,
    vgg_weights: Optional[str] = None,
    reduction: str = "mean",
    similarity_name: str = "lpips-vgg16",
) -> Dict[str, float]:
    """PPL of a generative model (reference metric_ppl.py protocol).

    ``model.apply`` must produce uint8 images (the eval output contract);
    LPIPS consumes their [0, 255] float values. ``similarity_name``
    resolves from the SAMPLE_SIMILARITIES registry (the reference's
    ppl_sample_similarity, metric_ppl.py:68-74).
    """
    assert epsilon > 0
    assert reduction in ("mean", "none"), reduction
    rng = np.random.RandomState(rng_seed)
    lat_e0 = sample_random(rng, (num_samples, model.z_size), model.z_type)
    lat_e1 = sample_random(rng, (num_samples, model.z_size), model.z_type)
    lat_e1 = np.asarray(
        INTERPOLATIONS[interp](jnp.asarray(lat_e0), jnp.asarray(lat_e1), epsilon)
    )
    labels = None
    if model.num_classes > 0:
        labels = rng.randint(0, model.num_classes, (num_samples,))

    from .registry import SAMPLE_SIMILARITIES

    if similarity_name not in SAMPLE_SIMILARITIES:
        raise KeyError(
            f"sample similarity '{similarity_name}' not registered; "
            f"known: {list(SAMPLE_SIMILARITIES)}"
        )
    lpips_module, lpips_vars = SAMPLE_SIMILARITIES[similarity_name](
        resize=similarity_resize,
        lpips_weights=lpips_weights,
        vgg_weights=vgg_weights,
    )
    lpips_fn = jax.jit(
        lambda v, a, b: lpips_module.apply(v, a, b)
    )

    distances = []
    for begin in range(0, num_samples, batch_size):
        end = min(begin + batch_size, num_samples)
        e0 = jnp.asarray(lat_e0[begin:end])
        e1 = jnp.asarray(lat_e1[begin:end])
        if labels is not None:
            lab = jnp.asarray(labels[begin:end])
            img0 = model.apply(e0, lab)
            img1 = model.apply(e1, lab)
        else:
            img0 = model.apply(e0)
            img1 = model.apply(e1)
        sim = lpips_fn(
            lpips_vars,
            jnp.asarray(img0).astype(jnp.float32),
            jnp.asarray(img1).astype(jnp.float32),
        )
        distances.append(np.asarray(sim) / (epsilon**2))
    dist = np.concatenate(distances)

    cond = None
    if discard_percentile_lower is not None:
        lo = np.percentile(dist, discard_percentile_lower, method="lower")
        cond = lo <= dist
    if discard_percentile_higher is not None:
        hi = np.percentile(dist, discard_percentile_higher, method="higher")
        cond = (dist <= hi) if cond is None else np.logical_and(cond, dist <= hi)
    if cond is not None:
        dist = np.extract(cond, dist)

    out = {
        KEY_PPL_MEAN: float(np.mean(dist)),
        KEY_PPL_STD: float(np.std(dist)),
    }
    if reduction == "none":
        out[KEY_PPL_RAW] = dist
    return out
