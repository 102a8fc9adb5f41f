"""Golden parity for the CLIP and DINOv2 extractors + converters
(VERDICT round-1 item 8).

CLIP: against the locally vendored reference implementation
(torch_fidelity/feature_extractor_clip.py) constructed from seeded
random checkpoints — both visual towers (ViT and ModifiedResNet).

DINOv2: the reference loads exclusively via torch.hub (network), so
parity is checked against a faithful local torch reimplementation of
the published ViT (tests/torch_ref.py MiniDINOv2) using the official
state-dict schema, covering the MLP and SwiGLU FFN variants and the
bicubic positional-embedding interpolation.
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_ref
from fastfourierconvolution_tpu.eval.clip import (
    CLIPExtractor,
    load_clip_state_dict,
    random_clip_state_dict,
)
from fastfourierconvolution_tpu.eval.dinov2 import (
    DINOv2Extractor,
    load_dinov2_state_dict,
    random_dinov2_state_dict,
)

pytestmark = pytest.mark.slow


def _uint8(shape, seed=7):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


class _JitStub:
    def __init__(self, sd):
        self._sd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    def state_dict(self):
        return dict(self._sd)


def _reference_clip(name: str, sd):
    clip_mod = torch_ref.import_reference("feature_extractor_clip")
    with mock.patch.object(
        torch.jit, "load", lambda *a, **k: _JitStub(sd)
    ):
        ref = clip_mod.FeatureExtractorCLIP(
            name, ["clip"], feature_extractor_weights_path="unused",
        )
    ref.eval()
    return ref


@pytest.mark.parametrize("name", ["clip-vit-b-32", "clip-rn50"])
def test_clip_matches_reference(name):
    sd = random_clip_state_dict(name, np.random.RandomState(3))
    ref = _reference_clip(name, sd)
    imgs = _uint8((2, 64, 64, 3), seed=11)
    with torch.no_grad():
        (ref_out,) = ref(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    variables = load_clip_state_dict(dict(sd))
    module = CLIPExtractor(("clip",), config=variables["config"])
    jax_out = jax.jit(module.apply)(
        {"params": variables["params"]}, jnp.asarray(imgs)
    )["clip"]
    err = torch_ref.rel_err(np.asarray(jax_out), ref_out.numpy())
    assert err < 2e-3, f"{name}: rel err {err}"


def test_clip_config_inference_all_variants():
    """The converter infers the official hyperparameters for all nine
    checkpoints (reference build_model, feature_extractor_clip.py:373-396)."""
    expect = {
        "clip-rn50": ("resnet", 224),
        "clip-rn101": ("resnet", 224),
        "clip-rn50x4": ("resnet", 288),
        "clip-rn50x16": ("resnet", 384),
        "clip-rn50x64": ("resnet", 448),
        "clip-vit-b-32": ("vit", 224),
        "clip-vit-b-16": ("vit", 224),
        "clip-vit-l-14": ("vit", 224),
        "clip-vit-l-14-336px": ("vit", 336),
    }
    for name, (kind, res) in expect.items():
        sd = random_clip_state_dict(name, np.random.RandomState(0))
        variables = load_clip_state_dict(sd)
        assert variables["config"]["kind"] == kind, name
        assert variables["config"]["resolution"] == res, name


def _mini_dinov2(sd, dim, depth, heads, swiglu=False, pos_grid=16):
    ref = torch_ref.MiniDINOv2(
        dim, depth, heads, swiglu=swiglu, pos_grid=pos_grid
    )
    ref.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in sd.items()})
    ref.eval()
    return ref


def _dino_preprocess_torch(imgs_uint8_nchw):
    """The reference extractor's preprocessing
    (feature_extractor_dinov2.py:79-94): TF1 resize + 255-scaled
    normalisation."""
    interp = torch_ref.import_reference("interpolate_compat_tensorflow")
    x = imgs_uint8_nchw.float()
    x = interp.interpolate_bilinear_2d_like_tensorflow1x(
        x, size=(224, 224), align_corners=False
    )
    mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None] * 255
    std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None] * 255
    return (x - mean) / std


@pytest.mark.parametrize(
    "name,depth,swiglu",
    [("dinov2-vit-s-14", 2, False), ("dinov2-vit-g-14", 1, True)],
)
def test_dinov2_matches_golden_torch(name, depth, swiglu):
    from fastfourierconvolution_tpu.eval.dinov2 import _DINOV2_META

    dim, _, heads, _ = _DINOV2_META[name]
    sd = random_dinov2_state_dict(
        name, np.random.RandomState(5), depth_override=depth
    )
    ref = _mini_dinov2(sd, dim, depth, heads, swiglu=swiglu)
    imgs = _uint8((2, 48, 48, 3), seed=13)
    with torch.no_grad():
        ref_out = ref(
            _dino_preprocess_torch(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        )
    variables = load_dinov2_state_dict(dict(sd))
    module = DINOv2Extractor(("dinov2",), config=variables["config"])
    jax_out = jax.jit(module.apply)(
        {"params": variables["params"]}, jnp.asarray(imgs)
    )["dinov2"]
    err = torch_ref.rel_err(np.asarray(jax_out), ref_out.numpy())
    assert err < 1e-3, f"{name}: rel err {err}"


def test_dinov2_pos_embed_interpolation_from_518px_grid():
    """Checkpoints store a 37x37 (518px) positional grid; the converter
    must bicubically interpolate to the 16x16 eval grid exactly like the
    hub model's runtime interpolate_pos_encoding (offset 0.1)."""
    dim, depth, heads = 384, 1, 6
    sd = random_dinov2_state_dict(
        "dinov2-vit-s-14", np.random.RandomState(9), depth_override=depth
    )
    # swap in a 37x37 pos grid
    rng = np.random.RandomState(21)
    sd["pos_embed"] = (rng.randn(1, 37 * 37 + 1, dim) * 0.02).astype(
        np.float32
    )
    ref = _mini_dinov2(sd, dim, depth, heads, pos_grid=37)
    imgs = _uint8((2, 32, 32, 3), seed=17)
    with torch.no_grad():
        ref_out = ref(
            _dino_preprocess_torch(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        )
    variables = load_dinov2_state_dict(dict(sd))
    assert variables["params"]["pos_embed"].shape[0] == 16 * 16 + 1
    module = DINOv2Extractor(("dinov2",), config=variables["config"])
    jax_out = jax.jit(module.apply)(
        {"params": variables["params"]}, jnp.asarray(imgs)
    )["dinov2"]
    err = torch_ref.rel_err(np.asarray(jax_out), ref_out.numpy())
    assert err < 1e-3, f"pos-embed interpolation: rel err {err}"


def test_clip_dinov2_registered_with_default_layers():
    from fastfourierconvolution_tpu.eval.registry import FEATURE_EXTRACTORS

    for name in (
        "clip-rn50", "clip-rn101", "clip-rn50x4", "clip-rn50x16",
        "clip-rn50x64", "clip-vit-b-32", "clip-vit-b-16", "clip-vit-l-14",
        "clip-vit-l-14-336px",
    ):
        spec = FEATURE_EXTRACTORS[name]
        assert spec["default_layers"]["fid"] == "clip", name
    for name in (
        "dinov2-vit-s-14", "dinov2-vit-b-14", "dinov2-vit-l-14",
        "dinov2-vit-g-14",
    ):
        spec = FEATURE_EXTRACTORS[name]
        assert spec["default_layers"]["fid"] == "dinov2", name


def test_fid_on_clip_features_via_orchestrator():
    """calculate_metrics(feature_extractor='clip-vit-b-32') end to end
    with random converted weights (uses the registry factory)."""
    from fastfourierconvolution_tpu.eval import calculate_metrics
    from fastfourierconvolution_tpu.eval.metrics import KEY_FID

    imgs = _uint8((24, 32, 32, 3), seed=1)
    out = calculate_metrics(
        imgs, imgs.copy(),
        fid=True,
        feature_extractor="clip-vit-b-32",
        batch_size=12,
        cache=False,
    )
    assert abs(out[KEY_FID]) < 1e-3
