"""Weights-free metric discriminativeness (round-1 verdict weak-1).

Without the TF-compat InceptionV3 checkpoint (zero-egress environment)
the extractor runs randomly initialised. Round 1 shipped the deep-tap
defaults, whose 94-conv random stack contracts every input to one point
(FID between unrelated sets = 4e-8, ISC pinned at 1.0). The fix routes
weights-free metrics through the shallow '192' tap + shallow logits
(eval/inception.py). These tests pin the discriminativeness contract
the pipeline now claims (the reference pipeline's contract with real
weights: torch_fidelity/feature_extractor_inceptionv3.py:131-205):

  * FID(structured, unrelated) >> FID(structured split A, split B),
  * FID grows monotonically with corruption strength,
  * ISC != 1 on structured data.
"""

import numpy as np
import pytest

from fastfourierconvolution_tpu.data.datasets import (
    ShapesDataset,
    SyntheticDataset,
)
from fastfourierconvolution_tpu.eval import pipeline as P
from fastfourierconvolution_tpu.eval.inception import weights_available
from fastfourierconvolution_tpu.eval.metrics import KEY_FID, KEY_ISC_MEAN

pytestmark = pytest.mark.skipif(
    weights_available(), reason="real InceptionV3 weights present"
)

N = 256  # enough for stable mu/sigma at 192 dims, cheap on CPU


def _shapes(seed, n=N):
    return ShapesDataset(n=n, size=32, seed=seed).images


def _fid(a, b):
    out = P.calculate_metrics(a, b, fid=True, cache=False)
    return out[KEY_FID]


def test_weights_free_default_layers_are_shallow():
    assert P._default_layer("inception-v3-compat", "fid") == "192"
    assert P._default_layer("inception-v3-compat", "kid") == "192"
    assert (
        P._default_layer("inception-v3-compat", "isc") == "logits_unbiased"
    )


def test_fid_separates_unrelated_sets():
    shapes_a = _shapes(0)
    shapes_b = _shapes(1)  # same distribution, disjoint sample
    noise = SyntheticDataset(n=N, size=32, seed=2).images  # unrelated
    fid_same = _fid(shapes_a, shapes_b)
    fid_diff = _fid(shapes_a, noise)
    assert fid_diff > 10 * max(fid_same, 1e-12), (
        f"weights-free FID not discriminative: same-dist {fid_same:.3g} "
        f"vs unrelated {fid_diff:.3g}"
    )


def test_fid_monotone_under_corruption():
    rng = np.random.RandomState(3)
    ref = _shapes(4)
    base = _shapes(5)
    fids = []
    for sigma in (0.0, 32.0, 96.0):
        noise = rng.normal(0.0, sigma, base.shape)
        corrupted = np.clip(
            base.astype(np.float64) + noise, 0, 255
        ).astype(np.uint8)
        fids.append(_fid(ref, corrupted))
    assert fids[0] < fids[1] < fids[2], (
        f"FID not monotone under corruption: {fids}"
    )


def test_isc_not_pinned_at_one_on_structured_data():
    out = P.calculate_metrics(
        _shapes(6), isc=True, isc_splits=4, cache=False
    )
    assert abs(out[KEY_ISC_MEAN] - 1.0) > 1e-3, (
        f"weights-free ISC still degenerate: {out[KEY_ISC_MEAN]}"
    )
