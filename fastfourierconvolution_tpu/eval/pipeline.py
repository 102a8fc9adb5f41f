"""Metric pipeline orchestration — the `calculate_metrics` equivalent.

Replicates the behavioral contract of
reference torch_fidelity/metrics.py:20-349 + utils.py:114-208,349-425:

  * two inputs (generated / reference), each resolvable from: a uint8
    ndarray (N, H, W, 3), a callable sampler ``f(n) -> uint8 images``, a
    :class:`GenerativeModel` wrapper, or a registered dataset name;
  * features extracted once per input with a jit'd InceptionV3 over
    fixed-size device batches, then fanned out to ISC/FID/KID/PRC;
  * seeded noise for generative inputs (rng_seed, default 2020);
  * an on-disk feature/statistics cache keyed
    ``{input_name}-{extractor}-features-{layer}`` with atomic writes
    (reference utils_torch.py:25-36 tempfile+rename semantics).
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M
from .inception import DEFAULT_FEATURE_LAYER, create_extractor

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser(os.environ.get("FFC_TPU_HOME", "~/.cache/ffc_tpu")),
    "fidelity_cache",
)


@dataclasses.dataclass
class GenerativeModel:
    """Wrapper pairing a sampler with its latent spec (the reference's
    GenerativeModelModuleWrapper, generative_model_modulewrapper.py:9-68).

    ``apply(z, labels) -> uint8 images (B, H, W, 3)``.
    """

    apply: Callable
    z_size: int
    z_type: str = "normal"
    num_classes: int = 0


# dataset registry: name -> callable () -> uint8 ndarray (N, H, W, 3)
_DATASETS: Dict[str, Callable[[], np.ndarray]] = {}


def register_dataset(name: str, loader: Callable[[], np.ndarray]) -> None:
    """Register an eval-side real dataset
    (reference registry.py:28-49 / util/data_loader.py:65-80)."""
    _DATASETS[name] = loader


def registered_datasets() -> Sequence[str]:
    return tuple(_DATASETS)


def _draw_noise(rng: jax.Array, n: int, z_size: int, z_type: str) -> jax.Array:
    if z_type == "normal":
        return jax.random.normal(rng, (n, z_size))
    if z_type == "unit":
        u = jax.random.normal(rng, (n, z_size))
        return u / jnp.linalg.norm(u, axis=1, keepdims=True)
    if z_type == "uniform_0_1":
        return jax.random.uniform(rng, (n, z_size))
    raise ValueError(f"unknown z_type {z_type}")


def _resolve_input(
    spec, num_samples: int, rng_seed: int, batch_size: int
) -> Callable[[int], np.ndarray]:
    """Return a chunked sampler ``f(start) -> batch of uint8 images``
    paired with total count, normalised across input kinds."""
    if isinstance(spec, str):
        if spec not in _DATASETS:
            raise KeyError(
                f"dataset '{spec}' not registered; known: {list(_DATASETS)}"
            )
        data = np.asarray(_DATASETS[spec]())
        assert data.dtype == np.uint8 and data.ndim == 4, data.shape
        n = min(num_samples, len(data)) if num_samples else len(data)

        def from_array(i):
            return data[i : i + batch_size]

        return from_array, n

    if isinstance(spec, np.ndarray) or isinstance(spec, jax.Array):
        data = np.asarray(spec)
        assert data.dtype == np.uint8 and data.ndim == 4, (
            f"image inputs must be uint8 NHWC, got {data.dtype} {data.shape}"
        )
        n = min(num_samples, len(data)) if num_samples else len(data)
        return (lambda i: data[i : i + batch_size]), n

    if isinstance(spec, GenerativeModel):
        rng = jax.random.PRNGKey(rng_seed)

        def from_model(i):
            b_rng = jax.random.fold_in(rng, i)
            z_rng, l_rng = jax.random.split(b_rng)
            z = _draw_noise(z_rng, batch_size, spec.z_size, spec.z_type)
            if spec.num_classes > 0:
                labels = jax.random.randint(
                    l_rng, (batch_size,), 0, spec.num_classes
                )
                imgs = spec.apply(z, labels)
            else:
                imgs = spec.apply(z)
            return np.asarray(imgs)

        assert num_samples, "generative inputs need input_model_num_samples"
        return from_model, num_samples

    if callable(spec):
        return (lambda i: np.asarray(spec(batch_size))), num_samples

    raise TypeError(f"cannot resolve metric input: {type(spec)}")


class FeatureExtractor:
    """jit'd batched InceptionV3 feature extraction."""

    def __init__(
        self,
        features_list: Sequence[str],
        weights_path: Optional[str] = None,
        batch_size: int = 128,
        name: str = "inception-v3-compat",
    ):
        self.name = name
        self.features_list = tuple(sorted(set(features_list)))
        self.batch_size = batch_size
        self.module, self.variables = create_extractor(
            self.features_list, weights_path
        )
        self._apply = jax.jit(
            lambda v, x: self.module.apply(v, x)
        )

    def extract(self, sampler, total: int) -> Dict[str, np.ndarray]:
        chunks: Dict[str, list] = {f: [] for f in self.features_list}
        i = 0
        while i < total:
            batch = sampler(i)
            if len(batch) == 0:
                break
            take = min(len(batch), total - i)
            batch = batch[:take]
            if len(batch) < self.batch_size:
                # pad to the jitted batch size, drop padding after
                pad = self.batch_size - len(batch)
                padded = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], np.uint8)]
                )
                feats = self._apply(self.variables, jnp.asarray(padded))
                feats = {k: np.asarray(v)[: len(batch)] for k, v in feats.items()}
            else:
                feats = {
                    k: np.asarray(v)
                    for k, v in self._apply(
                        self.variables, jnp.asarray(batch)
                    ).items()
                }
            for k in self.features_list:
                chunks[k].append(feats[k])
            i += len(batch)
        return {k: np.concatenate(v, axis=0) for k, v in chunks.items()}


def _cache_path(cache_dir, input_name, extractor_name, layer):
    return os.path.join(
        cache_dir, f"{input_name}-{extractor_name}-features-{layer}.npz"
    )


def _atomic_save(path: str, arrays: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def calculate_metrics(
    input1,
    input2=None,
    *,
    isc: bool = False,
    fid: bool = False,
    kid: bool = False,
    prc: bool = False,
    input1_model_num_samples: int = 10000,
    input2_model_num_samples: int = 10000,
    input1_cache_name: Optional[str] = None,
    input2_cache_name: Optional[str] = None,
    batch_size: int = 128,
    rng_seed: int = 2020,
    isc_splits: int = 10,
    kid_subsets: int = 100,
    kid_subset_size: int = 1000,
    prc_neighborhood: int = 3,
    feature_extractor_weights_path: Optional[str] = None,
    cache: bool = True,
    cache_dir: str = DEFAULT_CACHE_DIR,
    verbose: bool = False,
) -> Dict[str, float]:
    """Compute the requested metrics — the reference's
    ``torch_fidelity.calculate_metrics`` surface (metrics.py:112-349)."""
    assert isc or fid or kid or prc, "at least one metric must be requested"
    have_2 = fid or kid or prc

    layers = set()
    if isc:
        layers.add(DEFAULT_FEATURE_LAYER["isc"])
    if fid:
        layers.add(DEFAULT_FEATURE_LAYER["fid"])
    if kid:
        layers.add(DEFAULT_FEATURE_LAYER["kid"])
    if prc:
        layers.add(DEFAULT_FEATURE_LAYER["prc"])

    extractor = FeatureExtractor(
        sorted(layers),
        weights_path=feature_extractor_weights_path,
        batch_size=batch_size,
    )

    def features_for(spec, num_samples, cache_name):
        if cache and cache_name:
            paths = {
                l: _cache_path(cache_dir, cache_name, extractor.name, l)
                for l in extractor.features_list
            }
            if all(os.path.exists(p) for p in paths.values()):
                return {
                    l: np.load(p)["features"] for l, p in paths.items()
                }
        sampler, total = _resolve_input(
            spec, num_samples, rng_seed, batch_size
        )
        feats = extractor.extract(sampler, total)
        if cache and cache_name:
            for l, arr in feats.items():
                _atomic_save(
                    _cache_path(cache_dir, cache_name, extractor.name, l),
                    {"features": arr},
                )
        return feats

    name1 = input1_cache_name or (input1 if isinstance(input1, str) else None)
    feats1 = features_for(input1, input1_model_num_samples, name1)
    feats2 = None
    if have_2:
        assert input2 is not None, "fid/kid/prc need input2"
        name2 = input2_cache_name or (
            input2 if isinstance(input2, str) else None
        )
        feats2 = features_for(input2, input2_model_num_samples, name2)

    out: Dict[str, float] = {}
    if isc:
        layer = DEFAULT_FEATURE_LAYER["isc"]
        out.update(
            M.isc_features_to_metric(
                feats1[layer], splits=isc_splits, rng_seed=rng_seed
            )
        )
    if fid:
        layer = DEFAULT_FEATURE_LAYER["fid"]
        out[M.KEY_FID] = M.fid_features_to_metric(
            feats1[layer], feats2[layer]
        )
    if kid:
        layer = DEFAULT_FEATURE_LAYER["kid"]
        out.update(
            M.kid_features_to_metric(
                feats1[layer],
                feats2[layer],
                subsets=kid_subsets,
                subset_size=kid_subset_size,
                rng_seed=rng_seed,
            )
        )
    if prc:
        layer = DEFAULT_FEATURE_LAYER["prc"]
        out.update(
            M.prc_features_to_metric(
                feats1[layer], feats2[layer], neighborhood=prc_neighborhood
            )
        )
    if verbose:
        for k, v in out.items():
            print(f"{k}: {v:.7g}")
    return out
