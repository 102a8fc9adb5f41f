"""Registries for metric-pipeline components.

Mirrors the reference's registry surface
(reference torch_fidelity/registry.py:28-199): datasets (delegated to
eval.pipeline), feature extractors, sample similarities, noise sources,
latent interpolations.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from .pipeline import register_dataset, registered_datasets  # noqa: F401
from .ppl import INTERPOLATIONS, sample_random

FEATURE_EXTRACTORS: Dict[str, Callable] = {}
SAMPLE_SIMILARITIES: Dict[str, Callable] = {}
NOISE_SOURCES: Dict[str, Callable] = {
    "normal": lambda rng, shape: sample_random(rng, shape, "normal"),
    "unit": lambda rng, shape: sample_random(rng, shape, "unit"),
    "uniform_0_1": lambda rng, shape: sample_random(rng, shape, "uniform_0_1"),
}


def register_feature_extractor(
    name: str,
    factory: Callable,
    default_layers: Optional[Dict[str, str]] = None,
    provided: Optional[tuple] = None,
) -> None:
    """Register an extractor factory ``(features_list, weights_path) ->
    (module, variables)``. ``default_layers`` maps metric name ->
    feature layer (required for the extractor to serve metric defaults;
    without it callers must pass explicit feature_layer_* overrides)."""
    assert name not in FEATURE_EXTRACTORS, f"extractor '{name}' exists"
    FEATURE_EXTRACTORS[name] = {
        "factory": factory,
        "provided": provided or (),
        **({"default_layers": dict(default_layers)} if default_layers else {}),
    }


def register_sample_similarity(name: str, factory: Callable) -> None:
    assert name not in SAMPLE_SIMILARITIES, f"similarity '{name}' exists"
    SAMPLE_SIMILARITIES[name] = factory


def register_noise_source(name: str, fn: Callable) -> None:
    assert name not in NOISE_SOURCES, f"noise source '{name}' exists"
    NOISE_SOURCES[name] = fn


def register_interpolation(name: str, fn: Callable) -> None:
    assert name not in INTERPOLATIONS, f"interpolation '{name}' exists"
    INTERPOLATIONS[name] = fn


def _register_builtins() -> None:
    from .inception import create_extractor
    from .lpips import create_lpips, create_vgg16

    if "inception-v3-compat" not in FEATURE_EXTRACTORS:
        FEATURE_EXTRACTORS["inception-v3-compat"] = {
            "factory": create_extractor,
            "provided": (
                "64", "192", "768", "2048", "logits_unbiased", "logits",
            ),
            # reference feature_extractor_inceptionv3.py:212-218
            "default_layers": {
                "isc": "logits_unbiased",
                "fid": "2048",
                "kid": "2048",
                "prc": "2048",
            },
        }
    if "vgg16" not in FEATURE_EXTRACTORS:
        FEATURE_EXTRACTORS["vgg16"] = {
            "factory": create_vgg16,
            "provided": ("fc2", "fc2_relu"),
            # reference feature_extractor_vgg16.py:104-112
            "default_layers": {
                m: "fc2_relu" for m in ("isc", "fid", "kid", "prc")
            },
        }
    if "lpips-vgg16" not in SAMPLE_SIMILARITIES:
        SAMPLE_SIMILARITIES["lpips-vgg16"] = create_lpips

    import functools

    from .clip import CLIP_NAMES, create_clip_extractor
    from .dinov2 import DINOV2_NAMES, create_dinov2_extractor

    for clip_name in CLIP_NAMES:
        if clip_name not in FEATURE_EXTRACTORS:
            FEATURE_EXTRACTORS[clip_name] = {
                "factory": functools.partial(
                    create_clip_extractor, name=clip_name
                ),
                "provided": ("clip",),
                # reference feature_extractor_clip.py:529-536
                "default_layers": {
                    m: "clip" for m in ("isc", "fid", "kid", "prc")
                },
            }
    for dino_name in DINOV2_NAMES:
        if dino_name not in FEATURE_EXTRACTORS:
            FEATURE_EXTRACTORS[dino_name] = {
                "factory": functools.partial(
                    create_dinov2_extractor, name=dino_name
                ),
                "provided": ("dinov2",),
                # reference feature_extractor_dinov2.py:108-115
                "default_layers": {
                    m: "dinov2" for m in ("isc", "fid", "kid", "prc")
                },
            }


_register_builtins()
