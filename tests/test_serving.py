"""Serving-export tests: the jax.export artifact round-trip
(serving.py) and the CLI export/sample/fidelity loop. The reference's
portable-model analogue is the TorchScript/ONNX metric input kinds
(torch_fidelity/utils.py:272-286); here the artifact is the framework's
own eval-mode generator, hermetically lowered to StableHLO."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu import serving
from fastfourierconvolution_tpu.models import (
    FFCCondGenerator,
    FFCGenerator,
    SNConvDiscriminator,
    to_uint8,
)
from fastfourierconvolution_tpu.train import GANTrainer


@pytest.fixture(scope="module")
def tiny_trainer_and_state():
    g = FFCGenerator(
        z_size=32, ngf=16, ratio_g=0.25, mg=2, channel_mults=(4, 2, 1)
    )
    d = SNConvDiscriminator(
        ladder=((16, 3, 1), (16, 4, 2), (32, 4, 2), (64, 4, 2)), mg=2
    )
    trainer = GANTrainer(g, d, z_size=32, total_steps=100)
    real = jnp.zeros((8, 16, 16, 3))
    state = trainer.init(jax.random.PRNGKey(0), real)
    return trainer, state


def test_export_roundtrip_matches_generate(
    tiny_trainer_and_state, tmp_path
):
    """Serialize -> deserialize -> call must reproduce the eval-mode
    uint8 output exactly, at batch sizes never seen at export time
    (symbolic batch dim)."""
    trainer, state = tiny_trainer_and_state

    blob = serving.export_generator(
        lambda z: to_uint8(trainer.generate(state, z)),
        z_size=32,
        image_size=16,
        channels=3,
        platforms=("cpu",),
        step=123,
    )
    path = str(tmp_path / "g.ffcx")
    serving.save_exported(path, blob)

    call, meta = serving.load_exported(path)
    assert meta["z_size"] == 32 and meta["step"] == 123
    assert meta["image_size"] == 16 and meta["num_classes"] == 0
    for n in (3, 8):  # batch sizes the export never saw
        z = jax.random.normal(jax.random.PRNGKey(n), (n, 32))
        want = np.asarray(trainer.generate(state, z, uint8=True))
        got = np.asarray(call(np.asarray(z, np.float32)))
        assert got.dtype == np.uint8 and got.shape == (n, 16, 16, 3)
        np.testing.assert_array_equal(got, want)


def test_exported_generative_model_wrapper(
    tiny_trainer_and_state, tmp_path
):
    trainer, state = tiny_trainer_and_state
    path = str(tmp_path / "g.ffcx")
    serving.save_exported(
        path,
        serving.export_generator(
            lambda z: to_uint8(trainer.generate(state, z)),
            z_size=32, image_size=16, channels=3, platforms=("cpu",),
        ),
    )
    gm = serving.exported_generative_model(path)
    assert gm.z_size == 32 and gm.num_classes == 0
    imgs = gm.apply(np.random.RandomState(0).randn(5, 32))
    assert imgs.shape == (5, 16, 16, 3) and imgs.dtype == np.uint8


def test_export_conditional_with_labels(tmp_path):
    import flax.linen as fnn

    from fastfourierconvolution_tpu.nn.layers import SNConv2d, SNDense

    class TinyCondD(fnn.Module):
        num_classes: int = 3

        @fnn.compact
        def __call__(self, x, train, y):
            b, h, w, _ = x.shape
            tbl = self.param(
                "label_embed",
                fnn.initializers.normal(1.0),
                (self.num_classes, h * w),
            )
            plane = tbl[y.reshape(-1).astype(jnp.int32)].reshape(
                b, h, w, 1
            )
            x = jnp.concatenate([x, plane], axis=-1)
            x = fnn.leaky_relu(
                SNConv2d(16, 4, stride=2, padding=1)(x, train), 0.1
            )
            return SNDense(1)(x.reshape(b, -1), train)

    g = FFCCondGenerator(
        z_size=16, ngf=16, num_classes=3, mg=2, channel_mults=(2, 1)
    )
    d = TinyCondD()
    trainer = GANTrainer(
        g, d, z_size=16, total_steps=10, conditional=True, num_classes=3
    )
    real = jnp.zeros((4, 8, 8, 3))
    state = trainer.init(jax.random.PRNGKey(0), real)

    path = str(tmp_path / "gc.ffcx")
    serving.save_exported(
        path,
        serving.export_generator(
            lambda z, y: to_uint8(trainer.generate(state, z, y)),
            z_size=16, num_classes=3, image_size=8, channels=3,
            platforms=("cpu",),
        ),
    )
    gm = serving.exported_generative_model(path)
    assert gm.num_classes == 3
    z = np.random.RandomState(1).randn(6, 16).astype(np.float32)
    y = np.arange(6) % 3
    imgs = gm.apply(z, y)
    assert imgs.shape[0] == 6 and imgs.dtype == np.uint8
    with pytest.raises(ValueError, match="labels required"):
        gm.apply(z)


def test_load_exported_rejects_non_artifact(tmp_path):
    path = str(tmp_path / "bad.ffcx")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="FFCX"):
        serving.load_exported(path)


@pytest.mark.slow
def test_cli_export_then_sample_e2e(tmp_path):
    """train (ckpt) -> export -> sample --exported: the full serving
    loop through the real CLI."""
    from fastfourierconvolution_tpu.cli import main

    logs = str(tmp_path / "logs")
    common = [
        "--set", "data.dataset=synthetic",
        "--set", "data.image_size=16",
        "--set", "model.generator=ffc",
        "--set", "model.discriminator=ffc",
        "--set", "model.ngf=16",
        "--set", "model.z_size=32",
        "--set", "model.mg=2",
        "--set", "train.batch_size=8",
        "--set", "train.num_total_steps=4",
        "--set", "train.num_epoch_steps=4",
        "--set", "eval.isc=false", "--set", "eval.fid=false",
        "-o", logs,
    ]
    main(["train", "--set", "log.checkpoint=true",
          "--set", "log.checkpoint_after_frac=0.3", *common])
    artifact = str(tmp_path / "gen.ffcx")
    main(["export", "--output", artifact, "--platforms", "cpu", *common])
    assert os.path.isfile(artifact)

    out2 = str(tmp_path / "from_artifact")
    main(["sample", "--exported", artifact, "--num_samples", "9",
          *common[:-1], out2])
    pngs = [f for f in os.listdir(out2) if f.endswith(".png")]
    assert pngs, "sample --exported must write a grid PNG"
