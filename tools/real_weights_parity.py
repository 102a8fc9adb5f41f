"""One-command real-weights parity drill (VERDICT r3 item 3).

The north-star parity target (BASELINE.json: FID within ±2% of the
PyTorch reference) needs the real TF-compat InceptionV3 checkpoint
(reference feature_extractor_inceptionv3.py:19-21,
``weights-inception-2015-12-05-6726825d.pth``), which a zero-egress
host cannot fetch. The day a copy is dropped anywhere locally, this is
the whole proof:

    JAX_PLATFORMS=cpu python tools/real_weights_parity.py [/path/to/weights.pth]

It converts the checkpoint through the production converter
(eval/inception.py load_torch_weights), runs BOTH metric pipelines —
ours (eval.pipeline.calculate_metrics) and the reference's (the vendored
torch extractor + exec'd metric math, tests/metric_ab.py) — on fixed
seeded image sets at the reference's protocol layers (FID/KID '2048',
ISC 'logits_unbiased'), and writes the full ours-vs-reference table to
RUNS/parity_real_weights/metrics_ab.json. Exits 0 when every relative
difference is < 1e-3; exits 2 on disagreement.

Without an argument the standard local locations are searched
($FFC_TPU_INCEPTION_WEIGHTS, the torch hub cache path); when nothing is
found the search evidence is printed and the exit code is 3.

The same drill runs as a slow test, skipped when no weights exist:
tests/test_real_weights_parity.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon sitecustomize preempts the env var; parity needs no chip
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

PROTOCOL = {"fid": "2048", "isc": "logits_unbiased", "kid": "2048"}


def reference_real_extractor(path: str, feats):
    """The vendored reference extractor actually torch.load-ing the real
    checkpoint (feature_extractor_inceptionv3.py:66-77) — no mocks."""
    import torch_ref

    inc_mod = torch_ref.import_reference("feature_extractor_inceptionv3")
    ref = inc_mod.FeatureExtractorInceptionV3(
        "inception-v3-compat", list(feats),
        feature_extractor_weights_path=path,
    )
    ref.eval()
    return ref


def run_real_weights_parity(
    weights_path: str, n: int = 256, size: int = 32,
    kid_subsets: int = 10, kid_subset_size: int = 100,
) -> dict:
    """ours-vs-reference FID/ISC/KID at the protocol layers with the
    given real checkpoint; returns the comparison table."""
    import metric_ab

    from fastfourierconvolution_tpu.eval.metrics import (
        KEY_FID,
        KEY_ISC_MEAN,
        KEY_KID_MEAN,
    )
    from fastfourierconvolution_tpu.eval.pipeline import calculate_metrics

    feats = sorted({"2048", "logits_unbiased"})
    imgs_a, imgs_b = metric_ab.make_image_sets(n, size)

    ref = reference_real_extractor(weights_path, feats)
    fd_a = metric_ab.reference_features(ref, imgs_a, feats)
    fd_b = metric_ab.reference_features(ref, imgs_b, feats)
    fns = metric_ab.reference_metric_fns()
    stat_a = fns["fid_featuresdict_to_statistics"](fd_a, PROTOCOL["fid"])
    stat_b = fns["fid_featuresdict_to_statistics"](fd_b, PROTOCOL["fid"])
    reference = {
        "fid": fns["fid_statistics_to_metric"](stat_a, stat_b, False)[
            "frechet_inception_distance"
        ],
        "isc": fns["isc_features_to_metric"](fd_a[PROTOCOL["isc"]])[
            "inception_score_mean"
        ],
        "kid": fns["kid_features_to_metric"](
            fd_a[PROTOCOL["kid"]], fd_b[PROTOCOL["kid"]],
            kid_subsets=kid_subsets, kid_subset_size=kid_subset_size,
            verbose=False,
        )["kernel_inception_distance_mean"],
    }

    # ours: NO layer overrides — with real weights available the
    # pipeline's own defaults are exactly the protocol layers
    out = calculate_metrics(
        imgs_a, imgs_b, isc=True, fid=True, kid=True,
        feature_extractor_weights_path=weights_path,
        batch_size=64, kid_subsets=kid_subsets,
        kid_subset_size=kid_subset_size, cache=False,
    )
    ours = {
        "fid": out[KEY_FID], "isc": out[KEY_ISC_MEAN],
        "kid": out[KEY_KID_MEAN],
    }
    return {
        "_weights": os.path.abspath(weights_path),
        "_protocol_layers": PROTOCOL,
        "reference": reference,
        "ours": ours,
        "rel_diff": {
            k: abs(reference[k] - ours[k]) / max(abs(reference[k]), 1e-12)
            for k in reference
        },
    }


def main() -> int:
    from fastfourierconvolution_tpu.eval.inception import (
        WEIGHTS_ENV_VAR,
        find_local_weights,
    )

    path = sys.argv[1] if len(sys.argv) > 1 else find_local_weights()
    if path is None or not os.path.exists(path):
        searched = [
            f"${WEIGHTS_ENV_VAR}={os.environ.get(WEIGHTS_ENV_VAR)!r}",
            os.path.expanduser(
                "~/.cache/torch/hub/checkpoints/"
                "weights-inception-2015-12-05-6726825d.pth"
            ),
        ]
        print(
            "no real InceptionV3 weights found; searched:\n  "
            + "\n  ".join(searched)
            + "\ndrop the reference checkpoint and re-run "
            "(see feature_extractor_inceptionv3.py:19-21 for its URL)"
        )
        return 3

    table = run_real_weights_parity(path)
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "RUNS", "parity_real_weights"
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics_ab.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))
    worst = max(table["rel_diff"].values())
    print(f"worst rel diff: {worst:.3g}")
    return 0 if worst < 1e-3 else 2


if __name__ == "__main__":
    sys.exit(main())
