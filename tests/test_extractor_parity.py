"""Golden forward-parity tests: the JAX extractors + weight converters
vs the locally vendored torch implementations (random weights, no
network). VERDICT round 1, item 1 — these tests execute the converters
end-to-end and pin every tap of every extractor to the reference:

  * InceptionV3 (reference torch_fidelity/feature_extractor_inceptionv3.py:27-457)
  * VGG16 fc2/fc2_relu (reference torch_fidelity/feature_extractor_vgg16.py)
  * LPIPS-vgg16 (reference torch_fidelity/sample_similarity_lpips.py:22-163)
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_ref
from fastfourierconvolution_tpu.eval.inception import (
    InceptionV3,
    load_torch_weights,
)
from fastfourierconvolution_tpu.eval.lpips import (
    LPIPS,
    VGG16,
    load_lpips_torch_weights,
    load_vgg16_torch_weights,
)

pytestmark = pytest.mark.slow


def _uint8_batch(shape, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.fixture(scope="module")
def ref_inception():
    """Reference FeatureExtractorInceptionV3 with seeded random weights."""
    inc_mod = torch_ref.import_reference("feature_extractor_inceptionv3")
    feats = ["64", "192", "768", "2048", "logits_unbiased", "logits"]
    with mock.patch.object(torch, "load", lambda *a, **k: None), \
         mock.patch.object(
             torch.nn.Module, "load_state_dict",
             lambda self, sd, **kw: None,
         ):
        ref = inc_mod.FeatureExtractorInceptionV3(
            "inception-v3-compat", feats,
            feature_extractor_weights_path="unused",
        )
    sd = torch_ref.seeded_state_dict(ref, seed=0)
    ref.load_state_dict(sd)
    ref.eval()
    return ref, sd, feats


def test_inception_all_taps_match_reference(ref_inception):
    ref, sd, feats = ref_inception
    imgs = _uint8_batch((3, 64, 64, 3))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    ref_taps = dict(zip(feats, (t.numpy() for t in ref_out)))

    module = InceptionV3(features_list=tuple(feats))
    variables = load_torch_weights(sd)
    jax_taps = jax.jit(module.apply)(variables, jnp.asarray(imgs))

    for name in feats:
        err = torch_ref.rel_err(np.asarray(jax_taps[name]), ref_taps[name])
        assert err < 1e-3, f"tap {name}: rel err {err}"


def test_inception_early_exit_taps_match_full(ref_inception):
    """Requesting a tap subset must give identical values (early exit)."""
    ref, sd, feats = ref_inception
    imgs = _uint8_batch((2, 32, 32, 3), seed=11)
    full = InceptionV3(features_list=tuple(feats))
    sub = InceptionV3(features_list=("64", "768"))
    variables = load_torch_weights(sd)
    out_full = full.apply(variables, jnp.asarray(imgs))
    out_sub = sub.apply(variables, jnp.asarray(imgs))
    for name in ("64", "768"):
        np.testing.assert_allclose(
            np.asarray(out_sub[name]), np.asarray(out_full[name]), atol=1e-6
        )


@pytest.fixture(scope="module")
def ref_vgg16():
    vgg_mod = torch_ref.import_reference("feature_extractor_vgg16")
    torch.manual_seed(0)
    import torchvision  # the stub installed by torch_ref

    sd = torch_ref.seeded_state_dict(torchvision.models.vgg16(), seed=1)
    with mock.patch.object(torch, "load", lambda *a, **k: sd):
        ref = vgg_mod.FeatureExtractorVGG16(
            "vgg16", ["fc2", "fc2_relu"],
            feature_extractor_weights_path="unused",
        )
    ref.eval()
    return ref, sd


def test_vgg16_fc2_taps_match_reference(ref_vgg16):
    ref, sd = ref_vgg16
    imgs = _uint8_batch((3, 48, 48, 3), seed=3)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    ref_taps = dict(zip(["fc2", "fc2_relu"], (t.numpy() for t in ref_out)))

    module = VGG16(features_list=("fc2", "fc2_relu"))
    variables = load_vgg16_torch_weights(sd)
    jax_taps = jax.jit(module.apply)(variables, jnp.asarray(imgs))

    for name in ("fc2", "fc2_relu"):
        err = torch_ref.rel_err(np.asarray(jax_taps[name]), ref_taps[name])
        assert err < 1e-3, f"tap {name}: rel err {err}"


@pytest.fixture(scope="module")
def ref_lpips():
    lpips_mod = torch_ref.import_reference("sample_similarity_lpips")
    rng = np.random.RandomState(5)
    chns = (64, 128, 256, 512, 512)
    lin_sd = {
        f"lin{i}.model.1.weight": torch.from_numpy(
            rng.uniform(0.0, 0.2, (1, c, 1, 1)).astype(np.float32)
        )
        for i, c in enumerate(chns)
    }
    torch.manual_seed(2)
    with mock.patch.object(
        lpips_mod, "load_state_dict_from_url", lambda *a, **k: lin_sd
    ):
        ref = lpips_mod.SampleSimilarityLPIPS(
            "lpips-vgg16", sample_similarity_resize=64
        )
    ref.eval()
    # net.slice{k}.{orig_idx}.weight -> features.{orig_idx}.weight
    vgg_features_sd = {}
    for key, tensor in ref.state_dict().items():
        if key.startswith("net.slice"):
            idx_and_leaf = key.split(".", 2)[2]  # "{idx}.{weight|bias}"
            vgg_features_sd[f"features.{idx_and_leaf}"] = tensor
    return ref, lin_sd, vgg_features_sd


@pytest.mark.parametrize("size", [32, 128])
def test_lpips_matches_reference(ref_lpips, size):
    """Covers both resize branches: bilinear upsample (32 -> 64) and
    area downsample (128 -> 64), reference sample_similarity_lpips.py:128-133."""
    ref, lin_sd, vgg_sd = ref_lpips
    rng = np.random.RandomState(13 + size)
    a = rng.uniform(0, 255, (2, size, size, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref_val = ref(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).numpy()

    module = LPIPS(resize=64)
    variables = {"params": load_lpips_torch_weights(lin_sd, vgg_sd)["params"]}
    jax_val = np.asarray(
        jax.jit(module.apply)(variables, jnp.asarray(a), jnp.asarray(b))
    )
    err = torch_ref.rel_err(jax_val, ref_val)
    assert err < 1e-3, f"lpips rel err {err} ({jax_val} vs {ref_val})"
