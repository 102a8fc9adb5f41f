"""Import helpers for golden-parity tests against the locally vendored
reference ``torch_fidelity`` package (/root/reference/torch_fidelity).

The reference package ``__init__`` pulls modules that require torchvision
(absent here). Two tricks make the relevant golden modules importable:

  * ``torch_fidelity`` is registered in ``sys.modules`` as a bare package
    (``__path__`` set, ``__init__`` never executed) so that submodules
    resolve without triggering the package-wide imports;
  * a minimal ``torchvision`` stub supplies the only two surfaces the
    golden modules touch: ``transforms.functional.normalize`` and
    ``models.vgg16`` (the well-known VGG16-D architecture, rebuilt here
    from its public definition so state-dict keys match torchvision's).

These helpers let tests construct the reference extractors with *random*
weights, convert them with this repo's converters, and assert forward
parity — no network access needed (VERDICT round 1, item 1).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def _build_torchvision_stub() -> types.ModuleType:
    tv = types.ModuleType("torchvision")

    # --- transforms.functional.normalize (per-channel affine on NCHW) ---
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def normalize(x, mean, std, inplace=False):
        mean_t = torch.as_tensor(mean, dtype=x.dtype)[None, :, None, None]
        std_t = torch.as_tensor(std, dtype=x.dtype)[None, :, None, None]
        return (x - mean_t) / std_t

    functional.normalize = normalize
    transforms.functional = functional
    tv.transforms = transforms

    # --- models.vgg16 (architecture only; configuration "D") -----------
    models = types.ModuleType("torchvision.models")

    class _StubVGG16(nn.Module):
        """torchvision-compatible VGG16: identical module tree and
        state-dict keys (features.N.*, classifier.N.*)."""

        def __init__(self):
            super().__init__()
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
            layers = []
            in_c = 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
                else:
                    layers.append(nn.Conv2d(in_c, v, kernel_size=3, padding=1))
                    layers.append(nn.ReLU(inplace=True))
                    in_c = v
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096),
                nn.ReLU(True),
                nn.Dropout(),
                nn.Linear(4096, 4096),
                nn.ReLU(True),
                nn.Dropout(),
                nn.Linear(4096, 1000),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    def vgg16(**kwargs):
        return _StubVGG16()

    models.vgg16 = vgg16
    models.VGG16_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = models
    return tv


def install_stubs() -> None:
    """Install the torchvision stub + the bare torch_fidelity package."""
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = _build_torchvision_stub()
    if "torch_fidelity" not in sys.modules:
        pkg = types.ModuleType("torch_fidelity")
        pkg.__path__ = [f"{REFERENCE_ROOT}/torch_fidelity"]
        sys.modules["torch_fidelity"] = pkg


def import_reference(submodule: str):
    """Import ``torch_fidelity.<submodule>`` from the vendored copy."""
    install_stubs()
    import importlib

    return importlib.import_module(f"torch_fidelity.{submodule}")


def seeded_state_dict(module: nn.Module, seed: int = 0) -> dict:
    """A well-conditioned random state dict covering every parameter.

    Draws conv/linear weights from N(0, 0.05), biases from N(0, 0.02),
    BN scale from U(0.5, 1.5), BN bias N(0, 0.1), running_mean N(0, 0.1),
    running_var U(0.5, 1.5) — keeps activations bounded through deep
    stacks so forward-parity comparisons stay in a sane float range
    while still exercising the conversion of every tensor.
    """
    rng = np.random.RandomState(seed)
    sd = {}
    for key, tensor in module.state_dict().items():
        shape = tuple(tensor.shape)
        if key.endswith("num_batches_tracked"):
            sd[key] = torch.zeros(shape, dtype=tensor.dtype)
        elif key.endswith("running_var"):
            sd[key] = torch.from_numpy(
                rng.uniform(0.5, 1.5, shape).astype(np.float32)
            )
        elif key.endswith("running_mean"):
            sd[key] = torch.from_numpy(
                (rng.randn(*shape) * 0.1).astype(np.float32)
            )
        elif ".bn.weight" in key:
            sd[key] = torch.from_numpy(
                rng.uniform(0.5, 1.5, shape).astype(np.float32)
            )
        elif ".bn.bias" in key:
            sd[key] = torch.from_numpy(
                (rng.randn(*shape) * 0.1).astype(np.float32)
            )
        elif key.endswith("bias"):
            sd[key] = torch.from_numpy(
                (rng.randn(*shape) * 0.02).astype(np.float32)
            )
        else:
            sd[key] = torch.from_numpy(
                (rng.randn(*shape) * 0.05).astype(np.float32)
            )
    return sd


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    """max |a-b| / max(|b|) — scale-aware comparison for deep stacks."""
    denom = max(float(np.max(np.abs(b))), 1e-6)
    return float(np.max(np.abs(a - b))) / denom
