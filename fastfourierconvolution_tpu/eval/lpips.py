"""LPIPS (vgg16) sample similarity + VGG16 feature extractor.

Re-implementation of the reference's LPIPS
(reference torch_fidelity/sample_similarity_lpips.py:15-163) and the
VGG16 fc2 feature extractor used by PRC
(reference torch_fidelity/feature_extractor_vgg16.py), in flax/NHWC:

  * VGG16 backbone with the five relu taps (relu1_2 ... relu5_3);
  * LPIPS: channel-unit-normalised features, squared difference, learned
    bias-free 1x1 heads, spatial mean, summed over the five taps;
  * input contract: [0, 255]-range tensors normalised with the rescaled
    torchvision mean/std (sample_similarity_lpips.py:115-120), optional
    resize (area when downsampling, bilinear align_corners=False when
    upsampling — interpolate semantics preserved via exact separable
    matmul formulations).

Weights cannot be downloaded here (zero egress): converters accept local
torch checkpoints (torchvision vgg16 + the toshas LPIPS heads); without
them a seeded random init keeps the pipeline runnable for relative
comparisons and tests (documented divergence, as with InceptionV3).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resize import resize_bilinear_tf1  # TF1 used only by inception

# VGG16 conv plan: (features, layers-in-block)
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def _max_pool2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGG16Features(nn.Module):
    """VGG16 conv backbone returning the five LPIPS relu taps."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        li = 0
        for bi, (feat, n_layers) in enumerate(_VGG_PLAN):
            for _ in range(n_layers):
                kernel = self.param(
                    f"conv{li}_kernel",
                    nn.initializers.lecun_normal(),
                    (3, 3, x.shape[-1], feat),
                )
                bias = self.param(
                    f"conv{li}_bias", nn.initializers.zeros, (feat,)
                )
                x = (
                    lax.conv_general_dilated(
                        x,
                        kernel,
                        (1, 1),
                        ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    + bias
                )
                x = nn.relu(x)
                li += 1
            taps.append(x)
            if bi < len(_VGG_PLAN) - 1:
                x = _max_pool2(x)
        return tuple(taps)


class VGG16(nn.Module):
    """Full VGG16 with classifier, exposing 'fc2' / 'fc2_relu' features
    (the PRC default layer, reference feature_extractor_vgg16.py).

    Preprocessing matches the reference exactly
    (feature_extractor_vgg16.py:72-84): TF1-exact bilinear resize to
    224 (align_corners=False) — NOT torch interpolate area/bilinear —
    then the 255-rescaled torchvision normalisation.
    """

    features_list: Sequence[str] = ("fc2_relu",)
    # reference feature_extractor_vgg16.py:69: the uint8 input is cast to
    # the internal dtype BEFORE resize/normalize, so the whole tower runs
    # at the requested precision; returned features are cast back to f32
    # (:90,95)
    internal_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        assert x.dtype == jnp.uint8, "VGG16 extractor expects uint8 images"
        x = x.astype(jnp.dtype(self.internal_dtype))
        x = resize_bilinear_tf1(x, (224, 224), align_corners=False)
        mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
        std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0
        x = (x - mean) / std
        taps = VGG16Features(name="features")(x)
        x = _max_pool2(taps[-1])  # final pool after relu5_3 -> (B,7,7,512)
        x = x.reshape(x.shape[0], -1)
        out: Dict[str, jax.Array] = {}
        for i, feat in enumerate((4096, 4096)):
            w = self.param(
                f"fc{i}_kernel",
                nn.initializers.lecun_normal(),
                (x.shape[-1], feat),
            )
            b = self.param(f"fc{i}_bias", nn.initializers.zeros, (feat,))
            x = x @ w + b
            if i == 1:
                if "fc2" in self.features_list:
                    out["fc2"] = x.astype(jnp.float32)
            x = nn.relu(x)
        if "fc2_relu" in self.features_list:
            out["fc2_relu"] = x.astype(jnp.float32)
        return out


class LPIPS(nn.Module):
    """LPIPS distance between two [0, 255]-range NHWC batches."""

    resize: Optional[int] = 64

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array) -> jax.Array:
        def prep(x):
            x = x.astype(jnp.float32)
            if self.resize is not None:
                x = resize_bilinear_area_or_bilinear(
                    x, (self.resize, self.resize)
                )
            # rescaled torchvision normalisation
            # (reference sample_similarity_lpips.py:115-120)
            mean = (1 + jnp.asarray([-0.030, -0.088, -0.188])) * 255.0 / 2
            inv_std = 2.0 / (jnp.asarray([0.458, 0.448, 0.450]) * 255.0)
            return (x - mean) * inv_std

        net = VGG16Features(name="net")
        taps0 = net(prep(x0))
        taps1 = net(prep(x1))

        def unit_normalize(f, eps=1e-10):
            norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
            return f / (norm + eps)

        total = 0.0
        for i, (f0, f1) in enumerate(zip(taps0, taps1)):
            d = (unit_normalize(f0) - unit_normalize(f1)) ** 2
            w = self.param(
                f"lin{i}_kernel",
                nn.initializers.uniform(0.1),
                (LPIPS_CHANNELS[i], 1),
            )
            val = jnp.einsum("bhwc,co->bhwo", d, w)[..., 0]
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def resize_bilinear_area_or_bilinear(
    x: jax.Array, size: Tuple[int, int]
) -> jax.Array:
    """torch F.interpolate semantics used by LPIPS preprocessing:
    'area' (adaptive average pool) when strictly downsampling, bilinear
    align_corners=False otherwise — both as exact separable matmuls."""
    out_h, out_w = size
    in_h, in_w = x.shape[1], x.shape[2]
    if in_h == out_h and in_w == out_w:
        return x
    if in_h > out_h and in_w > out_w:
        wh = jnp.asarray(_adaptive_avg_matrix(in_h, out_h))
        ww = jnp.asarray(_adaptive_avg_matrix(in_w, out_w))
    else:
        wh = jnp.asarray(_bilinear_half_pixel_matrix(in_h, out_h))
        ww = jnp.asarray(_bilinear_half_pixel_matrix(in_w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, x)


@functools.lru_cache(maxsize=32)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch adaptive_avg_pool1d weights (what mode='area' lowers to)."""
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


@functools.lru_cache(maxsize=32)
def _bilinear_half_pixel_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch bilinear align_corners=False (half-pixel centers)."""
    idx = np.arange(out_size, dtype=np.float64)
    src = (idx + 0.5) * in_size / out_size - 0.5
    lo = np.clip(np.floor(src), 0, in_size - 1).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = np.clip(src - lo, 0.0, 1.0)
    w = np.zeros((out_size, in_size), np.float32)
    w[np.arange(out_size), lo] += 1.0 - frac
    w[np.arange(out_size), hi] += frac
    return w


# --- weight conversion -------------------------------------------------------

# torchvision vgg16().features indices of the 13 conv layers
_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _load_sd(path_or_dict):
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        return torch.load(path_or_dict, map_location="cpu", weights_only=True)
    return path_or_dict


def _to_np(t):
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def _convert_vgg_features(vgg_sd, prefix: str = "features.") -> Dict:
    """torchvision ``features.N.{weight,bias}`` -> conv{li}_{kernel,bias}
    (OIHW -> HWIO)."""
    out: Dict = {}
    for li, torch_li in enumerate(_TORCH_CONV_IDX):
        w = _to_np(vgg_sd[f"{prefix}{torch_li}.weight"])
        b = _to_np(vgg_sd[f"{prefix}{torch_li}.bias"])
        out[f"conv{li}_kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        out[f"conv{li}_bias"] = jnp.asarray(b)
    return out


def load_vgg16_torch_weights(path_or_dict) -> Dict:
    """Convert a torchvision vgg16 state dict to the :class:`VGG16`
    extractor's variables.

    The fc1 kernel needs a layout permutation on top of the transpose:
    torch flattens NCHW activations (25088 = C*H*W); this module
    flattens NHWC (H*W*C). ``classifier.0.weight`` (4096, 25088) is
    reshaped to (4096, 512, 7, 7), permuted to (7, 7, 512, 4096) and
    flattened back so both models compute the same linear map.
    """
    sd = _load_sd(path_or_dict)
    params: Dict = {"features": _convert_vgg_features(sd)}
    w0 = _to_np(sd["classifier.0.weight"])  # (4096, 512*7*7) CHW-ordered
    params["fc0_kernel"] = jnp.asarray(
        w0.reshape(4096, 512, 7, 7).transpose(2, 3, 1, 0).reshape(-1, 4096)
    )
    params["fc0_bias"] = jnp.asarray(_to_np(sd["classifier.0.bias"]))
    params["fc1_kernel"] = jnp.asarray(_to_np(sd["classifier.3.weight"]).T)
    params["fc1_bias"] = jnp.asarray(_to_np(sd["classifier.3.bias"]))
    return {"params": params}


def create_vgg16(
    features_list: Sequence[str] = ("fc2_relu",),
    weights_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    internal_dtype: Optional[str] = None,
):
    """Build (module, variables) for the VGG16 extractor; converts a
    torchvision state dict when provided (or found via
    $FFC_TPU_VGG16_WEIGHTS), random init otherwise."""
    import os

    module = VGG16(
        features_list=tuple(features_list),
        internal_dtype=internal_dtype or "float32",
    )
    weights_path = weights_path or os.environ.get("FFC_TPU_VGG16_WEIGHTS") or None
    if weights_path is not None:
        variables = load_vgg16_torch_weights(weights_path)
    else:
        dummy = jnp.zeros((1, 8, 8, 3), jnp.uint8)
        variables = module.init(rng or jax.random.PRNGKey(0), dummy)
    return module, variables


def load_lpips_torch_weights(lpips_path, vgg_path=None):
    """Convert toshas LPIPS heads (+ torchvision vgg16 features) to this
    module's variables. The toshas checkpoint stores only the lin heads;
    the VGG16 backbone comes from a torchvision vgg16 state dict.
    Both arguments accept a path or an in-memory state dict."""
    variables: Dict = {"params": {"net": {}}}
    heads = _load_sd(lpips_path)
    for i in range(5):
        key = f"lin{i}.model.1.weight"  # (1, C, 1, 1)
        variables["params"][f"lin{i}_kernel"] = jnp.asarray(
            _to_np(heads[key]).reshape(-1, 1)
        )
    if vgg_path is not None:
        variables["params"]["net"] = _convert_vgg_features(_load_sd(vgg_path))
    return variables


def create_lpips(
    resize: Optional[int] = 64,
    lpips_weights: Optional[str] = None,
    vgg_weights: Optional[str] = None,
    rng: Optional[jax.Array] = None,
):
    """Weights default from $FFC_TPU_LPIPS_WEIGHTS / $FFC_TPU_VGG16_WEIGHTS
    when not passed (mirrors the inception extractor's local-weights
    discovery)."""
    import os

    module = LPIPS(resize=resize)
    lpips_weights = lpips_weights or os.environ.get("FFC_TPU_LPIPS_WEIGHTS") or None
    vgg_weights = vgg_weights or os.environ.get("FFC_TPU_VGG16_WEIGHTS") or None
    if lpips_weights:
        variables = load_lpips_torch_weights(lpips_weights, vgg_weights)
        # fill any missing backbone params from init
        dummy = jnp.zeros((1, 8, 8, 3), jnp.float32)
        init_vars = module.init(rng or jax.random.PRNGKey(0), dummy, dummy)
        merged = dict(init_vars["params"])
        merged.update(variables["params"])
        if variables["params"].get("net"):
            merged["net"] = variables["params"]["net"]
        variables = {"params": merged}
    else:
        dummy = jnp.zeros((1, 8, 8, 3), jnp.float32)
        variables = module.init(rng or jax.random.PRNGKey(0), dummy, dummy)
    return module, variables
