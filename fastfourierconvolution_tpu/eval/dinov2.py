"""DINOv2 ViT feature extractors ("dinov2-vit-s-14" ... "dinov2-vit-g-14").

JAX re-implementation of the reference's DINOv2 extractor
(reference torch_fidelity/feature_extractor_dinov2.py:21-120), whose
model is the public facebookresearch/dinov2 ViT:

  * patch-14 conv embedding, class token, positional embedding
    (bicubically interpolated from the 518px training grid to the 224px
    eval grid — done once at conversion time, since eval resolution is
    static),
  * pre-LN blocks (eps 1e-6) with LayerScale on both branches; MLP FFN
    for S/B/L, fused SwiGLU FFN for the giant variant (inferred from
    the checkpoint keys),
  * final LayerNorm, class-token output
    (dims: s=384, b=768, l=1024, g=1536).

Input contract matches the reference forward (:72-100): uint8 NHWC ->
TF1-exact bilinear resize to 224 -> 255-scaled torchvision
normalisation -> backbone -> 'dinov2' feature.

The reference downloads via torch.hub (no local-weights path at all,
:63-66); this converter instead accepts any DINOv2 backbone state dict.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resize import resize_bilinear_tf1

DINOV2_NAMES = (
    "dinov2-vit-s-14",
    "dinov2-vit-b-14",
    "dinov2-vit-l-14",
    "dinov2-vit-g-14",
)
_DINOV2_META = {
    # name: (dim, depth, heads, swiglu)
    "dinov2-vit-s-14": (384, 12, 6, False),
    "dinov2-vit-b-14": (768, 12, 12, False),
    "dinov2-vit-l-14": (1024, 24, 16, False),
    "dinov2-vit-g-14": (1536, 40, 24, True),
}
INPUT_IMAGE_SIZE = 224
PATCH = 14

_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def _ln(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attn(x, p, num_heads: int):
    b, l, d = x.shape
    hd = d // num_heads
    qkv = x @ p["qkv_w"].T + p["qkv_b"]  # (B, L, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, hd)
    k = k.reshape(b, l, num_heads, hd)
    v = v.reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, d)
    return out @ p["proj_w"].T + p["proj_b"]


def _block(x, p, num_heads: int):
    h = _attn(_ln(x, p["norm1"]), p, num_heads)
    x = x + h * p["ls1"]
    h = _ln(x, p["norm2"])
    if "w12" in p:  # fused SwiGLU (giant)
        h12 = h @ p["w12"].T + p["b12"]
        x1, x2 = jnp.split(h12, 2, axis=-1)
        h = jax.nn.silu(x1) * x2
        h = h @ p["w3"].T + p["b3"]
    else:
        h = jax.nn.gelu(h @ p["fc1_w"].T + p["fc1_b"], approximate=False)
        h = h @ p["fc2_w"].T + p["fc2_b"]
    return x + h * p["ls2"]


class DINOv2Extractor:
    """FeatureExtractor-compatible wrapper; ``apply(variables, uint8
    NHWC) -> {'dinov2': (B, D)}``."""

    def __init__(self, features_list: Sequence[str] = ("dinov2",),
                 config: Optional[Dict] = None,
                 internal_dtype: Optional[str] = None):
        self.features_list = tuple(features_list)
        self.config = config  # static ints stay off the jit inputs
        # input cast BEFORE resize/normalize — precision covers the
        # whole tower (same contract as the inception/vgg16 extractors)
        self.internal_dtype = internal_dtype or "float32"
        assert all(f == "dinov2" for f in self.features_list), (
            f"this extractor only provides the 'dinov2' feature, "
            f"got {features_list}"
        )

    def apply(self, variables, x: jax.Array) -> Dict[str, jax.Array]:
        p = variables["params"]
        heads = self.config["heads"]
        assert x.dtype == jnp.uint8, "DINOv2 extractor expects uint8 images"
        x = x.astype(jnp.dtype(self.internal_dtype))
        x = resize_bilinear_tf1(
            x, (INPUT_IMAGE_SIZE, INPUT_IMAGE_SIZE), align_corners=False
        )
        x = (x - _MEAN) / _STD
        x = lax.conv_general_dilated(
            x, p["patch_kernel"], (PATCH, PATCH), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["patch_bias"]
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = jnp.broadcast_to(p["cls_token"][None, None], (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["pos_embed"][None]
        for blk in p["blocks"]:
            x = _block(x, blk, heads)
        x = _ln(x, p["norm"])
        return {"dinov2": x[:, 0].astype(jnp.float32)}


# --- conversion ----------------------------------------------------------------


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().float()
    return np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)


def _interpolate_pos_embed(pos: np.ndarray, grid: int) -> np.ndarray:
    """DINOv2's interpolate_pos_encoding for a static eval grid:
    bicubic, antialias=False, scale (grid + 0.1) / M — done once here
    (the 518px checkpoints store a 37x37 grid; 224px eval needs 16x16).
    Uses torch's bicubic to match the hub model's runtime interpolation
    bit-for-bit."""
    n = pos.shape[1] - 1
    m = int(round(math.sqrt(n)))
    if m == grid:
        return pos
    import torch
    import torch.nn.functional as F

    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    dim = pos.shape[-1]
    t = torch.from_numpy(
        patch_pos.reshape(1, m, m, dim).transpose(0, 3, 1, 2).copy()
    )
    scale = float(grid + 0.1) / m  # interpolate_offset=0.1
    t = F.interpolate(
        t, scale_factor=(scale, scale), mode="bicubic", antialias=False
    )
    assert t.shape[-1] == grid, (t.shape, grid)
    out = t.numpy().transpose(0, 2, 3, 1).reshape(1, grid * grid, dim)
    return np.concatenate([cls_pos, out], axis=1)


def load_dinov2_state_dict(sd) -> Dict:
    """Convert a facebookresearch/dinov2 backbone state dict."""
    dim = _np(sd["cls_token"]).shape[-1]
    depth = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    heads = {384: 6, 768: 12, 1024: 16, 1536: 24}[dim]
    grid = INPUT_IMAGE_SIZE // PATCH
    params: Dict = {
        "patch_kernel": jnp.asarray(
            np.transpose(_np(sd["patch_embed.proj.weight"]), (2, 3, 1, 0))
        ),
        "patch_bias": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        "cls_token": jnp.asarray(_np(sd["cls_token"]).reshape(dim)),
        "pos_embed": jnp.asarray(
            _interpolate_pos_embed(_np(sd["pos_embed"]), grid)[0]
        ),
        "norm": {
            "scale": jnp.asarray(_np(sd["norm.weight"])),
            "bias": jnp.asarray(_np(sd["norm.bias"])),
        },
    }
    blocks = []
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": {"scale": jnp.asarray(_np(sd[f"{b}.norm1.weight"])),
                      "bias": jnp.asarray(_np(sd[f"{b}.norm1.bias"]))},
            "norm2": {"scale": jnp.asarray(_np(sd[f"{b}.norm2.weight"])),
                      "bias": jnp.asarray(_np(sd[f"{b}.norm2.bias"]))},
            "qkv_w": jnp.asarray(_np(sd[f"{b}.attn.qkv.weight"])),
            "qkv_b": jnp.asarray(_np(sd[f"{b}.attn.qkv.bias"])),
            "proj_w": jnp.asarray(_np(sd[f"{b}.attn.proj.weight"])),
            "proj_b": jnp.asarray(_np(sd[f"{b}.attn.proj.bias"])),
            "ls1": jnp.asarray(_np(sd[f"{b}.ls1.gamma"])),
            "ls2": jnp.asarray(_np(sd[f"{b}.ls2.gamma"])),
        }
        if f"{b}.mlp.w12.weight" in sd:
            blk["w12"] = jnp.asarray(_np(sd[f"{b}.mlp.w12.weight"]))
            blk["b12"] = jnp.asarray(_np(sd[f"{b}.mlp.w12.bias"]))
            blk["w3"] = jnp.asarray(_np(sd[f"{b}.mlp.w3.weight"]))
            blk["b3"] = jnp.asarray(_np(sd[f"{b}.mlp.w3.bias"]))
        else:
            blk["fc1_w"] = jnp.asarray(_np(sd[f"{b}.mlp.fc1.weight"]))
            blk["fc1_b"] = jnp.asarray(_np(sd[f"{b}.mlp.fc1.bias"]))
            blk["fc2_w"] = jnp.asarray(_np(sd[f"{b}.mlp.fc2.weight"]))
            blk["fc2_b"] = jnp.asarray(_np(sd[f"{b}.mlp.fc2.bias"]))
        blocks.append(blk)
    params["blocks"] = blocks
    return {"params": params, "config": {"heads": heads, "dim": dim}}


def load_dinov2_torch_weights(path_or_dict) -> Dict:
    if not isinstance(path_or_dict, (str, bytes)):
        return load_dinov2_state_dict(path_or_dict)
    import torch

    sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
    return load_dinov2_state_dict(sd)


def random_dinov2_state_dict(
    name: str, rng: np.random.RandomState, depth_override: Optional[int] = None
) -> Dict[str, np.ndarray]:
    """A seeded random state dict in the official key schema (for
    pipeline tests and the golden converter test)."""
    dim, depth, heads, swiglu = _DINOV2_META[name]
    depth = depth_override or depth
    grid = INPUT_IMAGE_SIZE // PATCH
    sd: Dict[str, np.ndarray] = {}

    def put(key, *shape, scale=0.02):
        sd[key] = (rng.randn(*shape) * scale).astype(np.float32)

    put("cls_token", 1, 1, dim)
    put("pos_embed", 1, grid * grid + 1, dim)
    put("patch_embed.proj.weight", dim, 3, PATCH, PATCH, scale=0.05)
    put("patch_embed.proj.bias", dim)
    sd["norm.weight"] = np.ones((dim,), np.float32)
    sd["norm.bias"] = np.zeros((dim,), np.float32)
    hidden = 4 * dim
    for i in range(depth):
        b = f"blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = np.ones((dim,), np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros((dim,), np.float32)
        put(f"{b}.attn.qkv.weight", 3 * dim, dim)
        put(f"{b}.attn.qkv.bias", 3 * dim)
        put(f"{b}.attn.proj.weight", dim, dim)
        put(f"{b}.attn.proj.bias", dim)
        sd[f"{b}.ls1.gamma"] = np.full((dim,), 0.5, np.float32)
        sd[f"{b}.ls2.gamma"] = np.full((dim,), 0.5, np.float32)
        if swiglu:
            sw_hidden = 4096 if dim == 1536 else (2 * hidden) // 3
            put(f"{b}.mlp.w12.weight", 2 * sw_hidden, dim)
            put(f"{b}.mlp.w12.bias", 2 * sw_hidden)
            put(f"{b}.mlp.w3.weight", dim, sw_hidden)
            put(f"{b}.mlp.w3.bias", dim)
        else:
            put(f"{b}.mlp.fc1.weight", hidden, dim)
            put(f"{b}.mlp.fc1.bias", hidden)
            put(f"{b}.mlp.fc2.weight", dim, hidden)
            put(f"{b}.mlp.fc2.bias", dim)
    return sd


def create_dinov2_extractor(
    features_list: Sequence[str] = ("dinov2",),
    weights_path: Optional[str] = None,
    name: str = "dinov2-vit-s-14",
    rng: Optional[np.random.RandomState] = None,
    internal_dtype: Optional[str] = None,
) -> Tuple[DINOv2Extractor, Dict]:
    if weights_path is not None:
        variables = load_dinov2_torch_weights(weights_path)
    else:
        variables = load_dinov2_state_dict(
            random_dinov2_state_dict(name, rng or np.random.RandomState(0))
        )
    module = DINOv2Extractor(
        features_list, config=variables["config"],
        internal_dtype=internal_dtype,
    )
    return module, {"params": variables["params"]}
