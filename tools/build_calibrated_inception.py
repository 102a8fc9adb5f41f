"""Build a calibrated InceptionV3 .pth usable as real extractor weights.

The TF-compat FID weights are not downloadable in this environment
(zero egress). This tool materialises the round-3 parity scheme
(tests/torch_ref.py calibrated_inception_state_dict: variance-preserving
orthogonal kernels + BN running stats calibrated on real images) as an
on-disk ``.pth`` so training runs can point
``$FFC_TPU_INCEPTION_WEIGHTS`` at it and get a *discriminative*
deep-tap ('2048') FID — the reference protocol tap
(reference torch_fidelity/metric_fid.py:32-46,
feature_extractor_inceptionv3.py:212-218) — instead of the weights-free
shallow-tap fallback. Numbers from it are NOT comparable to published
FID (different weights), but they rank distributions at every depth
and decrease as samples approach the calibration distribution.

Usage:
    python tools/build_calibrated_inception.py [out.pth] [n_calib]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/inception_calibrated.pth"
    n_calib = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from unittest import mock

    import torch
    import torch_ref

    from fastfourierconvolution_tpu.data.datasets import ShapesDataset

    torch_ref.install_stubs()
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

    calib = ShapesDataset(n=n_calib, size=32).images  # uint8 NHWC
    sd = torch_ref.calibrated_inception_state_dict(ref, calib, seed=0)
    torch.save(sd, out)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
          f"calibrated on {n_calib} shapes images)")


if __name__ == "__main__":
    main()
