"""InceptionV3 feature extractor, FID-compatible ("inception-v3-compat").

A flax/NHWC re-implementation of the TF-weights-compatible InceptionV3
used by torch-fidelity for FID/ISC/KID
(reference torch_fidelity/feature_extractor_inceptionv3.py:27-457):

  * uint8 input contract; TF1-exact bilinear resize to 299 with
    align_corners=False; ``(x - 128) / 128`` scaling,
  * TF-patched blocks: InceptionA/C/E_1 use avg-pool with
    ``count_include_pad=False``; InceptionE_2 uses max-pool,
  * feature taps {'64','192','768','2048','logits_unbiased','logits'}
    with early exit, BN eps 1e-3, fc to 1008 classes.

Weights: the TF-converted checkpoint cannot be downloaded in this
environment (zero egress). :func:`load_torch_weights` converts the
torch-fidelity ``.pth`` state dict to this module's variables whenever a
local copy exists (weights_path config / $FFC_TPU_INCEPTION_WEIGHTS).

Weights-free fallback (pipeline-test mode): a randomly initialised
94-conv stack contracts every input to the same point (round-1 verdict:
FID between two *unrelated* image sets = 4e-8 through the random deep
taps — the ReLU ordered-phase correlation collapse), so without real
weights the extractor switches to SHALLOW taps: feature defaults route
to the '192' tap (5 convs — input separation survives) and
logits_unbiased is computed from a random projection of the 192-d
pooled features (``shallow_logits=True``) instead of the collapsed
2048-d head. This makes weights-free FID/ISC/KID *discriminative*
(monotone under corruption, tested in tests/test_weights_free_metrics.py)
though still not comparable to published numbers — that always needs
the converted TF weights.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resize import resize_bilinear_tf1

FEATURE_NAMES = ("64", "192", "768", "2048", "logits_unbiased", "logits")
DEFAULT_FEATURE_LAYER = {
    "isc": "logits_unbiased",
    "fid": "2048",
    "kid": "2048",
    "prc": "2048",
}
# Weights-free (random-init) defaults: shallow taps keep input
# separation; the deep taps are degenerate under random init (see module
# docstring). logits_unbiased is shallow too via ``shallow_logits``.
DEFAULT_FEATURE_LAYER_WEIGHTS_FREE = {
    "isc": "logits_unbiased",
    "fid": "192",
    "kid": "192",
    "prc": "192",
}


def _max_pool(x, k=3, s=2, pad=0):
    if pad:
        x = jnp.pad(
            x,
            ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            constant_values=-jnp.inf,
        )
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _avg_pool_tf(x, k=3, s=1, pad=1):
    """Average pool that excludes padding from the divisor
    (TF semantics; the reference's count_include_pad=False patch)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = lax.reduce_window(
        jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))),
        0.0,
        lax.add,
        (1, k, k, 1),
        (1, s, s, 1),
        "VALID",
    )
    counts = lax.reduce_window(
        jnp.pad(ones, ((0, 0), (pad, pad), (pad, pad), (0, 0))),
        0.0,
        lax.add,
        (1, k, k, 1),
        (1, s, s, 1),
        "VALID",
    )
    return summed / counts


class BasicConv2d(nn.Module):
    """conv (no bias) + BN(eps=1e-3, frozen stats) + relu."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        # lecun-normal keeps random-init activations unit-scale through the
        # deep stack (matters only in weights-free pipeline-test mode; real
        # runs overwrite with converted TF weights)
        # explicit f32 init dtype: keeps the random draws (weights-free
        # mode) bit-identical whether or not x64 mode is active for an
        # internal_dtype='float64' run
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        x = lax.conv_general_dilated(
            x,
            kernel,
            (self.stride, self.stride),
            ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # inference-only BN: y = (x - mean) / sqrt(var + eps) * gamma + beta
        c = self.features
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
        gamma = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        x = (x - mean) * lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_tf(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_tf(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """E block; ``pool='avg'`` for E_1 (TF avg-pool patch), ``'max'`` for
    E_2 (TF's max-pool quirk)."""

    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_tf(x)
        else:
            bp = _max_pool(x, k=3, s=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """The extractor. ``__call__(uint8_images) -> {tap: (B, D)}``.

    ``features_list`` selects taps (with early exit like the reference).
    """

    features_list: Sequence[str] = ("2048", "logits_unbiased")
    # weights-free mode: logits from a random projection of the pooled
    # '192' tap (the deep 2048-d head is degenerate under random init)
    shallow_logits: bool = False
    # the reference's feature_extractor_internal_dtype
    # (feature_extractor_inceptionv3.py:32,98-108): the uint8 input is
    # cast to this dtype BEFORE the TF1 resize so the whole pipeline,
    # resize included, runs at the requested precision. 'float64'
    # requires jax x64 mode (validated by the pipeline layer).
    internal_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        assert x.dtype == jnp.uint8, "InceptionV3 expects uint8 images"
        assert x.ndim == 4 and x.shape[-1] == 3, f"not BxHxWx3: {x.shape}"
        wanted = list(self.features_list)
        for f in wanted:
            assert f in FEATURE_NAMES, f
        out: Dict[str, jax.Array] = {}

        x = x.astype(jnp.dtype(self.internal_dtype))
        x = resize_bilinear_tf1(x, (299, 299), align_corners=False)
        x = (x - 128.0) / 128.0

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)

        if "64" in wanted:
            out["64"] = jnp.mean(x, axis=(1, 2))
            if len(out) == len(wanted):
                return out

        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)

        if "192" in wanted or (
            self.shallow_logits
            and ("logits_unbiased" in wanted or "logits" in wanted)
        ):
            pooled192 = jnp.mean(x, axis=(1, 2))
            if "192" in wanted:
                out["192"] = pooled192
            if self.shallow_logits and (
                "logits_unbiased" in wanted or "logits" in wanted
            ):
                w = self.param(
                    "fc192_kernel",
                    nn.initializers.lecun_normal(),
                    (192, 1008),
                    jnp.float32,
                )
                b = self.param(
                    "fc192_bias", nn.initializers.zeros, (1008,),
                    jnp.float32,
                )
                # per-image layernorm + gain before the projection: the
                # raw pooled magnitudes are tiny under random init, so
                # bare logits give a near-uniform softmax (ISC pinned at
                # ~1). Normalising per image (a pure per-sample map —
                # ISC-legal) makes logits ~N(0, gain²) per class, so the
                # softmax is peaked and varies with image content.
                mu = jnp.mean(pooled192, axis=-1, keepdims=True)
                sd = jnp.std(pooled192, axis=-1, keepdims=True) + 1e-8
                lu = (((pooled192 - mu) / sd) @ w) * 4.0
                if "logits_unbiased" in wanted:
                    out["logits_unbiased"] = lu
                if "logits" in wanted:
                    out["logits"] = lu + b
            if len(out) == len(wanted):
                return out

        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)

        if "768" in wanted:
            out["768"] = jnp.mean(x, axis=(1, 2))
            if len(out) == len(wanted):
                return out

        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # (B, 2048)

        if "2048" in wanted:
            out["2048"] = x
            if len(out) == len(wanted):
                return out

        assert not self.shallow_logits, (
            "shallow_logits filled every requested tap already"
        )
        w = self.param(
            "fc_kernel", nn.initializers.lecun_normal(), (2048, 1008),
            jnp.float32,
        )
        b = self.param("fc_bias", nn.initializers.zeros, (1008,), jnp.float32)
        logits_unbiased = x @ w
        if "logits_unbiased" in wanted:
            out["logits_unbiased"] = logits_unbiased
            if len(out) == len(wanted):
                return out
        out["logits"] = logits_unbiased + b
        return out


# --- torch-fidelity weight conversion ---------------------------------------

WEIGHTS_ENV_VAR = "FFC_TPU_INCEPTION_WEIGHTS"


def find_local_weights() -> Optional[str]:
    """Locate a torch-fidelity InceptionV3 .pth checkpoint, if present."""
    candidates = [
        os.environ.get(WEIGHTS_ENV_VAR, ""),
        os.path.expanduser(
            "~/.cache/torch/hub/checkpoints/weights-inception-2015-12-05-6726825d.pth"
        ),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_torch_weights(path, features_list=FEATURE_NAMES) -> Dict:
    """Convert the torch-fidelity InceptionV3 state dict to this module's
    variables (OIHW -> HWIO, fc transposed). ``path`` may be a .pth file
    path or an in-memory torch state dict."""
    if isinstance(path, (str, bytes)):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    else:
        sd = path
    params: Dict = {}

    def put(path_keys: List[str], value: np.ndarray):
        node = params
        for k in path_keys[:-1]:
            node = node.setdefault(k, {})
        node[path_keys[-1]] = jnp.asarray(value)

    for key, tensor in sd.items():
        v = tensor.numpy()
        parts = key.split(".")
        # e.g. 'Mixed_5b.branch1x1.conv.weight' / '.bn.running_mean' / 'fc.weight'
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(["fc_kernel"], v.T)
            else:
                put(["fc_bias"], v)
            continue
        *module_path, leaf_kind, leaf_name = parts
        if leaf_kind == "conv":
            assert leaf_name == "weight"
            put(module_path + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf_kind == "bn":
            name_map = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }
            if leaf_name in name_map:
                put(module_path + [name_map[leaf_name]], v)
        # num_batches_tracked etc. ignored
    return {"params": params}


def weights_available(weights_path: Optional[str] = None) -> bool:
    """True when real (converted) InceptionV3 weights will be used."""
    return (weights_path or find_local_weights()) is not None


def create_extractor(
    features_list: Sequence[str] = ("2048", "logits_unbiased"),
    weights_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    internal_dtype: Optional[str] = None,
):
    """Build (module, variables). Loads converted TF-compat weights when
    available; otherwise random init with ``shallow_logits=True``
    (discriminative pipeline-test mode — see module docstring).

    ``internal_dtype``: 'float32' (default) or 'float64' — the
    reference's feature_extractor_internal_dtype knob
    (feature_extractor_inceptionv3.py:56-64,98): both the weights and
    the in-model compute are cast to that dtype.
    """
    dtype = internal_dtype or "float32"
    path = weights_path or find_local_weights()
    module = InceptionV3(
        features_list=tuple(features_list),
        shallow_logits=path is None,
        internal_dtype=dtype,
    )
    if path is not None:
        variables = load_torch_weights(path)
    else:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 8, 8, 3), jnp.uint8)
        # init through an f32-compute module so the random draws are
        # identical regardless of internal_dtype / x64 mode (same
        # impl-independent-tree rule as nn/ffc.py); the cast below sets
        # the compute dtype
        init_module = module.clone(internal_dtype="float32")
        variables = init_module.init(rng, dummy)
    if dtype != "float32":
        target = jnp.dtype(dtype)
        variables = jax.tree.map(
            lambda v: v.astype(target)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            variables,
        )
    return module, variables
