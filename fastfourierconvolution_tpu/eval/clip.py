"""CLIP visual-tower feature extractors ("clip-rn50" ... "clip-vit-l-14-336px").

JAX re-implementation of the reference's CLIP extractor
(reference torch_fidelity/feature_extractor_clip.py:66-542), covering
both visual towers:

  * ModifiedResNet (rn50/rn101/rn50x4/x16/x64): 3-conv stem + avgpool,
    anti-aliased strided bottlenecks (avgpool before the strided conv),
    QKV attention pooling with a prepended mean token (:118-151);
  * VisionTransformer (vit-b-32/b-16/l-14/l-14-336px): patch conv,
    class embedding, pre-LN transformer with QuickGELU MLPs, ln_post on
    the class token, output projection (:280-326).

Input contract matches the reference forward (:495-520): uint8 NHWC ->
TF1-exact bilinear resize to the model resolution -> CLIP-normalise
(255-scaled means/stds) -> visual tower -> 'clip' feature.

Like the reference's ``build_model`` (:373-425), the architecture is
inferred *from the checkpoint state dict*, so one converter serves all
nine variants. The official checkpoints store fp16 weights; conversion
keeps their values bit-exactly (upcast to f32), matching the
reference's fp16-roundtrip load. No network access: a local checkpoint
state dict (or .pt jit archive via torch) is required for real weights;
seeded random variables keep the pipeline runnable otherwise.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resize import resize_bilinear_tf1

CLIP_NAMES = (
    "clip-rn50",
    "clip-rn101",
    "clip-rn50x4",
    "clip-rn50x16",
    "clip-rn50x64",
    "clip-vit-b-32",
    "clip-vit-b-16",
    "clip-vit-l-14",
    "clip-vit-l-14-336px",
)

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32) * 255.0
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32) * 255.0


def _conv(x, w, stride=1, padding=0):
    """NHWC conv with an OIHW torch kernel (converted to HWIO)."""
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p):
    inv = lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _avg_pool(x, k):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(q, k, v, num_heads: int, p) -> jax.Array:
    """Multi-head attention over (B, Lq/Lk, D) with separate projection
    params p = {wq, bq, wk, bk, wv, bv, wo, bo} (row-major torch layout:
    y = x @ w.T + b)."""
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // num_heads
    qh = (q @ p["wq"].T + p["bq"]).reshape(b, lq, num_heads, hd)
    kh = (k @ p["wk"].T + p["bk"]).reshape(b, lk, num_heads, hd)
    vh = (v @ p["wv"].T + p["bv"]).reshape(b, lk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, lq, d)
    out_dim = p["wo"].shape[0]
    del out_dim
    return out @ p["wo"].T + p["bo"]


# --- ModifiedResNet tower -----------------------------------------------------


def _bottleneck(x, p, stride: int):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    identity = x
    if "downsample" in p:
        identity = _avg_pool(x, stride) if stride > 1 else x
        identity = _bn(_conv(identity, p["downsample_conv"]),
                       p["downsample_bn"])
    return jax.nn.relu(out + identity)


def _attn_pool(x, p, num_heads: int):
    """QKV attention pooling (reference AttentionPool2d, :118-151):
    tokens = [mean; HW], + positional embedding, attend with query =
    mean token only."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    tokens = tokens + p["positional_embedding"][None]
    out = _mha(tokens[:, :1], tokens, tokens, num_heads, p)
    return out[:, 0]


def _resnet_tower(x, params, cfg):
    p = params
    x = jax.nn.relu(_bn(_conv(x, p["conv1"], stride=2, padding=1), p["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, p["conv2"], padding=1), p["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, p["conv3"], padding=1), p["bn3"]))
    x = _avg_pool(x, 2)
    for li, nblocks in enumerate(cfg["layers"]):
        stride = 1 if li == 0 else 2
        for bi in range(nblocks):
            x = _bottleneck(
                x, p[f"layer{li + 1}"][bi], stride if bi == 0 else 1
            )
    return _attn_pool(x, p["attnpool"], cfg["heads"])


# --- VisionTransformer tower --------------------------------------------------


def _vit_block(x, p, num_heads: int):
    h = _ln(x, p["ln_1"])
    # torch MultiheadAttention: fused in_proj then out_proj
    d = x.shape[-1]
    w = p["in_proj_weight"]
    b = p["in_proj_bias"]
    attn_p = {
        "wq": w[:d], "bq": b[:d],
        "wk": w[d:2 * d], "bk": b[d:2 * d],
        "wv": w[2 * d:], "bv": b[2 * d:],
        "wo": p["out_proj_weight"], "bo": p["out_proj_bias"],
    }
    x = x + _mha(h, h, h, num_heads, attn_p)
    h = _ln(x, p["ln_2"])
    h = _quick_gelu(h @ p["c_fc_w"].T + p["c_fc_b"])
    h = h @ p["c_proj_w"].T + p["c_proj_b"]
    return x + h


def _vit_tower(x, params, cfg):
    p = params
    x = _conv(x, p["conv1"], stride=cfg["patch_size"])  # (B, g, g, W)
    b, gh, gw, width = x.shape
    x = x.reshape(b, gh * gw, width)
    cls = jnp.broadcast_to(p["class_embedding"][None, None], (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"][None]
    x = _ln(x, p["ln_pre"])
    for blk in p["blocks"]:
        x = _vit_block(x, blk, cfg["heads"])
    x = _ln(x[:, 0], p["ln_post"])
    return x @ p["proj"]


# --- extractor ----------------------------------------------------------------


class CLIPExtractor:
    """FeatureExtractor-compatible wrapper; ``apply(variables, uint8
    NHWC) -> {'clip': (B, D)}``.

    ``config`` (the static hyperparameters inferred by the converter)
    lives on the module, NOT in ``variables`` — shape-determining ints
    must stay static under jit."""

    def __init__(self, features_list: Sequence[str] = ("clip",),
                 config: Optional[Dict] = None,
                 internal_dtype: Optional[str] = None):
        self.features_list = tuple(features_list)
        self.config = config
        # input cast BEFORE resize/normalize so the whole tower runs at
        # the requested precision (reference feature_extractor_clip.py
        # shares the internal-dtype kwarg contract)
        self.internal_dtype = internal_dtype or "float32"
        assert all(f == "clip" for f in self.features_list), (
            f"this extractor only provides the 'clip' feature, "
            f"got {features_list}"
        )

    def apply(self, variables, x: jax.Array) -> Dict[str, jax.Array]:
        params = variables["params"]
        cfg = self.config
        assert cfg is not None, "CLIPExtractor needs config (from converter)"
        assert x.dtype == jnp.uint8, "CLIP extractor expects uint8 images"
        x = x.astype(jnp.dtype(self.internal_dtype))
        res = cfg["resolution"]
        x = resize_bilinear_tf1(x, (res, res), align_corners=False)
        x = (x - _MEAN) / _STD
        if cfg["kind"] == "vit":
            feat = _vit_tower(x, params, cfg)
        else:
            feat = _resnet_tower(x, params, cfg)
        return {"clip": feat.astype(jnp.float32)}


# --- conversion (mirrors reference build_model, :373-425) ----------------------


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "float"):
        t = t.float()
    return np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)


def _conv_w(t):
    return jnp.asarray(np.transpose(_np(t), (2, 3, 1, 0)))


def _bn_params(sd, prefix):
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def _ln_params(sd, prefix):
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def load_clip_state_dict(sd) -> Dict:
    """Convert an OpenAI CLIP checkpoint state dict (or the visual
    subset) into this extractor's variables. Architecture hyperparams
    are inferred exactly like the reference's build_model."""
    is_vit = "visual.proj" in sd
    params: Dict = {}
    if is_vit:
        width = sd["visual.conv1.weight"].shape[0]
        n_layers = len(
            [k for k in sd
             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        cfg = {
            "kind": "vit",
            "resolution": int(patch_size * grid),
            "patch_size": int(patch_size),
            "heads": int(width) // 64,
        }
        params["conv1"] = _conv_w(sd["visual.conv1.weight"])
        params["class_embedding"] = jnp.asarray(
            _np(sd["visual.class_embedding"])
        )
        params["positional_embedding"] = jnp.asarray(
            _np(sd["visual.positional_embedding"])
        )
        params["ln_pre"] = _ln_params(sd, "visual.ln_pre")
        params["ln_post"] = _ln_params(sd, "visual.ln_post")
        params["proj"] = jnp.asarray(_np(sd["visual.proj"]))
        blocks = []
        for i in range(n_layers):
            b = f"visual.transformer.resblocks.{i}"
            blocks.append({
                "ln_1": _ln_params(sd, f"{b}.ln_1"),
                "ln_2": _ln_params(sd, f"{b}.ln_2"),
                "in_proj_weight": jnp.asarray(_np(sd[f"{b}.attn.in_proj_weight"])),
                "in_proj_bias": jnp.asarray(_np(sd[f"{b}.attn.in_proj_bias"])),
                "out_proj_weight": jnp.asarray(_np(sd[f"{b}.attn.out_proj.weight"])),
                "out_proj_bias": jnp.asarray(_np(sd[f"{b}.attn.out_proj.bias"])),
                "c_fc_w": jnp.asarray(_np(sd[f"{b}.mlp.c_fc.weight"])),
                "c_fc_b": jnp.asarray(_np(sd[f"{b}.mlp.c_fc.bias"])),
                "c_proj_w": jnp.asarray(_np(sd[f"{b}.mlp.c_proj.weight"])),
                "c_proj_b": jnp.asarray(_np(sd[f"{b}.mlp.c_proj.bias"])),
            })
        params["blocks"] = blocks
    else:
        counts = [
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_grid = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        cfg = {
            "kind": "resnet",
            "resolution": int(out_grid * 32),
            "layers": tuple(counts),
            "heads": int(width) * 32 // 64,
        }
        for i in (1, 2, 3):
            params[f"conv{i}"] = _conv_w(sd[f"visual.conv{i}.weight"])
            params[f"bn{i}"] = _bn_params(sd, f"visual.bn{i}")
        for li, nblocks in enumerate(counts):
            layer = []
            for bi in range(nblocks):
                b = f"visual.layer{li + 1}.{bi}"
                bp = {
                    "conv1": _conv_w(sd[f"{b}.conv1.weight"]),
                    "bn1": _bn_params(sd, f"{b}.bn1"),
                    "conv2": _conv_w(sd[f"{b}.conv2.weight"]),
                    "bn2": _bn_params(sd, f"{b}.bn2"),
                    "conv3": _conv_w(sd[f"{b}.conv3.weight"]),
                    "bn3": _bn_params(sd, f"{b}.bn3"),
                }
                if f"{b}.downsample.0.weight" in sd:
                    bp["downsample"] = True
                    bp["downsample_conv"] = _conv_w(sd[f"{b}.downsample.0.weight"])
                    bp["downsample_bn"] = _bn_params(sd, f"{b}.downsample.1")
                layer.append(bp)
            params[f"layer{li + 1}"] = layer
        ap = "visual.attnpool"
        params["attnpool"] = {
            "positional_embedding": jnp.asarray(
                _np(sd[f"{ap}.positional_embedding"])
            ),
            "wq": jnp.asarray(_np(sd[f"{ap}.q_proj.weight"])),
            "bq": jnp.asarray(_np(sd[f"{ap}.q_proj.bias"])),
            "wk": jnp.asarray(_np(sd[f"{ap}.k_proj.weight"])),
            "bk": jnp.asarray(_np(sd[f"{ap}.k_proj.bias"])),
            "wv": jnp.asarray(_np(sd[f"{ap}.v_proj.weight"])),
            "bv": jnp.asarray(_np(sd[f"{ap}.v_proj.bias"])),
            "wo": jnp.asarray(_np(sd[f"{ap}.c_proj.weight"])),
            "bo": jnp.asarray(_np(sd[f"{ap}.c_proj.bias"])),
        }
    return {"params": params, "config": cfg}


def load_clip_torch_weights(path_or_dict) -> Dict:
    """Accepts a state dict, a .pth state-dict file, or an OpenAI .pt
    jit archive (the official distribution format)."""
    if not isinstance(path_or_dict, (str, bytes)):
        return load_clip_state_dict(path_or_dict)
    import torch

    try:
        sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.jit.load(path_or_dict, map_location="cpu").state_dict()
    return load_clip_state_dict(sd)


def random_clip_state_dict(name: str, rng: np.random.RandomState) -> Dict:
    """A seeded random checkpoint state dict with the official
    architecture hyperparameters for ``name`` (pipeline testing and the
    golden converter tests). Values are fp16-representable, like the
    official checkpoints, so the reference's fp16 load path is
    lossless."""
    vit_meta = {
        "clip-vit-b-32": (32, 768, 12, 512, 224),
        "clip-vit-b-16": (16, 768, 12, 512, 224),
        "clip-vit-l-14": (14, 1024, 24, 768, 224),
        "clip-vit-l-14-336px": (14, 1024, 24, 768, 336),
    }
    rn_meta = {
        "clip-rn50": ((3, 4, 6, 3), 64, 1024, 224),
        "clip-rn101": ((3, 4, 23, 3), 64, 512, 224),
        "clip-rn50x4": ((4, 6, 10, 6), 80, 640, 288),
        "clip-rn50x16": ((6, 8, 18, 8), 96, 768, 384),
        "clip-rn50x64": ((3, 15, 36, 10), 128, 1024, 448),
    }
    sd: Dict[str, np.ndarray] = {}

    def put(key, *shape, scale=0.02):
        v = (rng.randn(*shape) * scale).astype(np.float32)
        sd[key] = v.astype(np.float16).astype(np.float32)

    if name in vit_meta:
        patch, width, layers, embed, res = vit_meta[name]
        grid = res // patch
        put("visual.conv1.weight", width, 3, patch, patch)
        put("visual.class_embedding", width)
        put("visual.positional_embedding", grid * grid + 1, width)
        for p in ("visual.ln_pre", "visual.ln_post"):
            sd[f"{p}.weight"] = np.ones((width,), np.float32)
            sd[f"{p}.bias"] = np.zeros((width,), np.float32)
        put("visual.proj", width, embed)
        for i in range(layers):
            b = f"visual.transformer.resblocks.{i}"
            put(f"{b}.attn.in_proj_weight", 3 * width, width)
            put(f"{b}.attn.in_proj_bias", 3 * width)
            put(f"{b}.attn.out_proj.weight", width, width)
            put(f"{b}.attn.out_proj.bias", width)
            for p in (f"{b}.ln_1", f"{b}.ln_2"):
                sd[f"{p}.weight"] = np.ones((width,), np.float32)
                sd[f"{p}.bias"] = np.zeros((width,), np.float32)
            put(f"{b}.mlp.c_fc.weight", 4 * width, width)
            put(f"{b}.mlp.c_fc.bias", 4 * width)
            put(f"{b}.mlp.c_proj.weight", width, 4 * width)
            put(f"{b}.mlp.c_proj.bias", width)
    else:
        layers, width, embed, res = rn_meta[name]

        def bn(prefix, c):
            q = lambda v: v.astype(np.float16).astype(np.float32)
            sd[f"{prefix}.weight"] = q(rng.uniform(0.5, 1.5, c).astype(np.float32))
            sd[f"{prefix}.bias"] = q((rng.randn(c) * 0.1).astype(np.float32))
            sd[f"{prefix}.running_mean"] = q((rng.randn(c) * 0.1).astype(np.float32))
            sd[f"{prefix}.running_var"] = q(rng.uniform(0.5, 1.5, c).astype(np.float32))

        put("visual.conv1.weight", width // 2, 3, 3, 3, scale=0.1)
        bn("visual.bn1", width // 2)
        put("visual.conv2.weight", width // 2, width // 2, 3, 3, scale=0.05)
        bn("visual.bn2", width // 2)
        put("visual.conv3.weight", width, width // 2, 3, 3, scale=0.05)
        bn("visual.bn3", width)
        inplanes = width
        for li, nblocks in enumerate(layers):
            planes = width * (2**li)
            for bi in range(nblocks):
                b = f"visual.layer{li + 1}.{bi}"
                put(f"{b}.conv1.weight", planes, inplanes, 1, 1, scale=0.05)
                bn(f"{b}.bn1", planes)
                put(f"{b}.conv2.weight", planes, planes, 3, 3, scale=0.05)
                bn(f"{b}.bn2", planes)
                put(f"{b}.conv3.weight", planes * 4, planes, 1, 1, scale=0.05)
                bn(f"{b}.bn3", planes * 4)
                stride = 1 if li == 0 else 2
                if bi == 0 and (stride > 1 or inplanes != planes * 4):
                    put(f"{b}.downsample.0.weight", planes * 4, inplanes,
                        1, 1, scale=0.05)
                    bn(f"{b}.downsample.1", planes * 4)
                inplanes = planes * 4
        emb_dim = width * 32
        grid = res // 32
        put("visual.attnpool.positional_embedding", grid * grid + 1, emb_dim,
            scale=emb_dim**-0.5)
        for pr in ("q_proj", "k_proj", "v_proj"):
            put(f"visual.attnpool.{pr}.weight", emb_dim, emb_dim, scale=0.02)
            put(f"visual.attnpool.{pr}.bias", emb_dim)
        put("visual.attnpool.c_proj.weight", embed, emb_dim, scale=0.02)
        put("visual.attnpool.c_proj.bias", embed)
    sd["text_projection"] = np.zeros((1, embed), np.float32)
    return sd


def create_clip_extractor(
    features_list: Sequence[str] = ("clip",),
    weights_path: Optional[str] = None,
    name: str = "clip-vit-b-32",
    rng: Optional[np.random.RandomState] = None,
    internal_dtype: Optional[str] = None,
) -> Tuple[CLIPExtractor, Dict]:
    if weights_path is not None:
        variables = load_clip_torch_weights(weights_path)
    else:
        variables = load_clip_state_dict(
            random_clip_state_dict(name, rng or np.random.RandomState(0))
        )
    module = CLIPExtractor(
        features_list, config=variables["config"],
        internal_dtype=internal_dtype,
    )
    return module, {"params": variables["params"]}
