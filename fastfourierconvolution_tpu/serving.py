"""Serving export: serialize the eval-mode generator as a portable
compiled artifact.

This is the TPU-native analogue of the reference's portable-model story
(torch-fidelity consumes TorchScript ``.pth`` and ONNX ``.onnx``
generative models, reference torch_fidelity/utils.py:272-286,
generative_model_onnx.py:1): the jitted eval-mode sampling function
(z [, labels] -> uint8 NHWC images, the reference's eval output
contract fgan_complete.py:136-139) is lowered once through
``jax.export`` to StableHLO with a *symbolic batch dimension* and
multi-platform lowerings (cpu + tpu), then serialized. The resulting
``.ffcx`` artifact:

- needs only ``jax`` to run — no model code, no flax, no checkpoint
  tree, no config;
- runs on any batch size and on either platform it was lowered for;
- is hermetic: weights are baked into the program as constants, so the
  artifact is a complete, versioned serving unit;
- plugs straight back into the metric pipeline as a generative-model
  input kind (``cli fidelity model.ffcx real-set -f``), exactly like
  the reference's ``.onnx``/``.pth`` kinds.

File format: ``FFCX1\n`` magic, one JSON metadata line (latent spec +
image geometry + platforms), then the raw ``jax.export`` serialization.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"FFCX1\n"


def export_generator(
    generate_fn,
    *,
    z_size: int,
    num_classes: int = 0,
    z_type: str = "normal",
    image_size: int,
    channels: int = 3,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    step: int = 0,
) -> bytes:
    """Lower ``generate_fn(z[, labels]) -> uint8 NHWC`` to a serialized
    multi-platform StableHLO artifact with a symbolic batch dimension.

    ``generate_fn`` must be a closed-over sampling function (weights
    captured as constants), e.g. ``lambda z: to_uint8(trainer.generate
    (state, z))``.
    """
    import jax
    from jax import export as jexport

    (b,) = jexport.symbolic_shape("b")
    z_spec = jax.ShapeDtypeStruct((b, z_size), np.float32)
    if num_classes > 0:
        args = (z_spec, jax.ShapeDtypeStruct((b,), np.int32))
    else:
        args = (z_spec,)
    exported = jexport.export(jax.jit(generate_fn), platforms=platforms)(
        *args
    )
    meta = {
        "z_size": int(z_size),
        "z_type": z_type,
        "num_classes": int(num_classes),
        "image_size": int(image_size),
        "channels": int(channels),
        "platforms": list(platforms),
        "step": int(step),
    }
    return (
        _MAGIC
        + json.dumps(meta).encode("utf-8")
        + b"\n"
        + exported.serialize()
    )


def save_exported(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_exported(path: str):
    """Return ``(callable, meta)`` for an ``.ffcx`` artifact. The
    callable maps ``(z[, labels]) -> uint8 NHWC`` for any batch size."""
    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(
            f"{path} is not an FFCX artifact (bad magic "
            f"{blob[:6]!r}; expected {_MAGIC!r})"
        )
    header_end = blob.index(b"\n", len(_MAGIC))
    meta = json.loads(blob[len(_MAGIC):header_end].decode("utf-8"))
    exported = jexport.deserialize(blob[header_end + 1:])
    # jit the rehydrated call so executable caching per concrete batch
    # shape is guaranteed rather than relying on the eager-call cache.
    # Measured round 4 on v5e (batch-64 generate, fair per-call-sync
    # A/B): the artifact is at parity with the directly jitted
    # generator — async-dispatch 1.52 ms vs 1.58 ms direct; with a
    # host sync per call both sides cost the ~40 ms tunnel round trip.
    return jax.jit(exported.call), meta


def exported_generative_model(path: str):
    """Wrap an ``.ffcx`` artifact as an eval-pipeline
    :class:`~fastfourierconvolution_tpu.eval.pipeline.GenerativeModel`
    — the serving artifact doubles as a metric input kind, mirroring
    the reference's ONNX/TorchScript model inputs."""
    from .eval.pipeline import GenerativeModel

    call, meta = load_exported(path)

    def apply(z, labels=None):
        z = np.asarray(z, np.float32)
        if meta["num_classes"] > 0:
            if labels is None:
                raise ValueError(
                    f"{path} is a conditional model "
                    f"(num_classes={meta['num_classes']}): labels required"
                )
            out = call(z, np.asarray(labels, np.int32))
        else:
            out = call(z)
        out = np.asarray(out)
        if out.shape[-1] == 1:
            out = np.repeat(out, 3, axis=-1)
        return out

    return GenerativeModel(
        apply=apply,
        z_size=meta["z_size"],
        z_type=meta.get("z_type", "normal"),
        num_classes=meta["num_classes"],
    )
