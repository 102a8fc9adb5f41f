"""Config/preset/zoo/CLI tests + a short end-to-end driver run on the
synthetic dataset."""

import os
import sys

import numpy as np
import pytest

from fastfourierconvolution_tpu.utils.config import (
    PRESETS,
    make_config,
    parse_cli,
)
from fastfourierconvolution_tpu.zoo import build_models


def test_all_presets_resolve():
    for name in PRESETS:
        cfg = make_config(name)
        assert cfg.train.batch_size > 0


@pytest.mark.parametrize(
    "preset", ["fgan32", "fgan_cond32", "sngan", "resnet32", "sagan",
               "train_cond"]
)
def test_zoo_builds_models(preset):
    cfg = make_config(preset)
    g, d = build_models(cfg)
    assert g is not None and d is not None


def test_parse_cli_overrides():
    cmd, cfg, extras = parse_cli(
        ["train", "--preset", "fgan32", "-b", "32", "-e", "1000",
         "--set", "model.ratio_g=0.5", "--set", "eval.fid=false"]
    )
    assert extras["num_samples"] == 64
    assert cmd == "train"
    assert cfg.train.batch_size == 32
    assert cfg.train.num_total_steps == 1000
    assert cfg.model.ratio_g == 0.5
    assert cfg.eval.fid is False


def test_scalar_logger_and_plot(tmp_path):
    from fastfourierconvolution_tpu.utils.logging import (
        ScalarLogger,
        save_loss_plot,
    )

    logger = ScalarLogger(str(tmp_path))
    for s in range(5):
        logger.log(s, {"loss_g": 1.0 / (s + 1), "loss_d": 2.0, "lr": 1e-4})
    logger.close()
    assert os.path.exists(logger.csv_path)
    png = save_loss_plot(logger.csv_path)
    assert os.path.exists(png)


def test_make_grid_shapes():
    from fastfourierconvolution_tpu.utils.logging import make_grid

    imgs = np.zeros((10, 8, 8, 1), np.uint8)
    grid = make_grid(imgs, nrow=4)
    assert grid.shape[-1] == 3
    assert grid.shape[0] == 3 * 10 + 2  # ceil(10/4)=3 rows


@pytest.mark.slow
def test_driver_end_to_end_tiny(tmp_path):
    """Short synthetic training run through the real CLI driver."""
    from fastfourierconvolution_tpu.cli import main

    logs = str(tmp_path / "logs")
    main(
        [
            "train",
            "--set", "data.dataset=synthetic",
            "--set", "data.image_size=16",
            "--set", "model.generator=ffc",
            "--set", "model.discriminator=ffc",
            "--set", "model.ngf=16",
            "--set", "model.z_size=32",
            "--set", "model.mg=2",
            "--set", "train.batch_size=8",
            "--set", "train.num_total_steps=6",
            "--set", "train.num_epoch_steps=3",
            "--set", "eval.isc=false",
            "--set", "eval.fid=false",
            "--set", "log.checkpoint=true",
            "--set", "log.checkpoint_after_frac=0.3",
            "-o", logs,
        ]
    )
    assert os.path.exists(os.path.join(logs, "gan_losses.csv"))
    assert os.path.exists(os.path.join(logs, "000003.png"))
    ckpts = os.listdir(os.path.join(logs, "checkpoints"))
    assert any("steps.ckpt" in c for c in ckpts)

    # sample from the checkpoint through the real CLI, asserting the
    # feature-map diagnostic figure SAVES (reference test.py:146-208).
    # Regression guard for the round-4 g_model NameError: the figure
    # path is wrapped in a diagnostics-never-block-sampling try/except,
    # so only an existence check catches a silent failure there.
    main(
        [
            "sample",
            "--set", "data.dataset=synthetic",
            "--set", "data.image_size=16",
            "--set", "model.generator=ffc",
            "--set", "model.discriminator=ffc",
            "--set", "model.ngf=16",
            "--set", "model.z_size=32",
            "--set", "model.mg=2",
            "--num_samples", "8",
            "-o", logs,
        ]
    )
    assert os.path.exists(os.path.join(logs, "samples_000006.png"))
    assert os.path.exists(
        os.path.join(logs, "feature_maps_000006.png")
    ), "feature-map diagnostic silently failed (see run_sample except)"


@pytest.mark.slow
def test_driver_steps_per_call_chunked(tmp_path):
    """The K-chained driver path (uint8 feed + lax.scan chunks)."""
    from fastfourierconvolution_tpu.cli import main

    logs = str(tmp_path / "logs")
    main(
        [
            "train",
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
            "--set", "train.steps_per_call=2",
            "--set", "log.log_every=2",
            "--set", "eval.isc=false",
            "--set", "eval.fid=false",
            "--set", "log.checkpoint=false",
            "-o", logs,
        ]
    )
    import json

    rows = [json.loads(l) for l in open(os.path.join(logs, "scalars.jsonl"))
            if "loss_g" in l]
    assert len(rows) == 2  # logged at steps 2 and 4 (post-chunk)
    assert all(np.isfinite(r["loss_g"]) for r in rows)
    assert os.path.exists(os.path.join(logs, "000004.png"))


def test_bench_preflight_outage_marker():
    """bench.py on an unreachable backend must emit a self-describing
    skip marker with rc 0 (VERDICT r2 item 6) instead of burning the
    driver's budget in backend init and crashing rc=1."""
    import json as _json
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["FFC_TPU_BENCH_PREFLIGHT_CODE"] = "import time; time.sleep(60)"
    env["FFC_TPU_BENCH_PREFLIGHT_TIMEOUT"] = "2"
    r = subprocess.run(
        [sys.executable, os.path.join(repo_root, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    row = _json.loads(r.stdout.strip().splitlines()[-1])
    assert row["skipped"] == "backend-unavailable"
    assert row["vs_baseline"] == 0 and row["value"] == 0
