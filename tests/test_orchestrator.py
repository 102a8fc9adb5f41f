"""Metric-orchestrator routing: per-metric extractor defaults, the
PRC->vgg16 dual-extractor split, explicit extractor/layer overrides,
ppl= flag, the persistent extractor cache, and the fidelity CLI
(reference torch_fidelity/metrics.py:20-349, utils.py:28-33,325-346,
fidelity.py:21-340)."""

from __future__ import annotations

import json
import os
import types

import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.eval import pipeline as P
from fastfourierconvolution_tpu.eval import registry as R
from fastfourierconvolution_tpu.eval.metrics import KEY_FID


class _ToyModule:
    """A featureful stand-in extractor: cheap deterministic features."""

    def __init__(self, features_list, dim):
        self.features_list = tuple(features_list)
        self.dim = dim

    def apply(self, variables, x):
        xf = x.astype(jnp.float32) / 255.0
        flat = xf.reshape(xf.shape[0], -1)
        out = {}
        for i, name in enumerate(self.features_list):
            take = flat[:, : self.dim] * (i + 1)
            out[name] = take + jnp.arange(self.dim)[None, :] * 0.01
        return out


def _toy_factory(dim):
    def factory(features_list, weights_path=None):
        return _ToyModule(features_list, dim), {}

    return factory


@pytest.fixture()
def toy_extractors(monkeypatch):
    R.FEATURE_EXTRACTORS["toy-a"] = {
        "factory": _toy_factory(8),
        "provided": ("la1", "la2"),
        "default_layers": {
            "isc": "la1", "fid": "la2", "kid": "la2", "prc": "la2"
        },
    }
    R.FEATURE_EXTRACTORS["toy-b"] = {
        "factory": _toy_factory(6),
        "provided": ("lb",),
        "default_layers": {m: "lb" for m in ("isc", "fid", "kid", "prc")},
    }
    monkeypatch.setitem(P.DEFAULT_FEATURE_EXTRACTOR, "isc", "toy-a")
    monkeypatch.setitem(P.DEFAULT_FEATURE_EXTRACTOR, "fid", "toy-a")
    monkeypatch.setitem(P.DEFAULT_FEATURE_EXTRACTOR, "kid", "toy-a")
    monkeypatch.setitem(P.DEFAULT_FEATURE_EXTRACTOR, "prc", "toy-b")
    yield
    R.FEATURE_EXTRACTORS.pop("toy-a", None)
    R.FEATURE_EXTRACTORS.pop("toy-b", None)
    P._EXTRACTOR_CACHE.clear()


def _imgs(n=24, size=8, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, size, size, 3) * 255).astype(np.uint8)


def test_explicit_extractor_and_layer_override(toy_extractors):
    imgs = _imgs()
    out = P.calculate_metrics(
        imgs, _imgs(seed=1),
        fid=True,
        feature_extractor="toy-a",
        feature_layer_fid="la1",
        batch_size=8,
        cache=False,
    )
    assert np.isfinite(out[KEY_FID])
    # the cache holds one toy-a extractor with exactly the la1 layer
    keys = [k for k in P._EXTRACTOR_CACHE if k[0] == "toy-a"]
    assert keys and keys[0][1] == ("la1",)


def test_dual_extractor_split_prc_vs_inception_defaults(toy_extractors):
    """prc + (isc|fid|kid) with default extractors must fan out to two
    extractors (reference metrics.py:325-347)."""
    out = P.calculate_metrics(
        _imgs(), _imgs(seed=2),
        isc=True, fid=True, prc=True,
        batch_size=8,
        kid_subsets=2, kid_subset_size=8,
        cache=False,
    )
    assert {"inception_score_mean", KEY_FID, "precision"} <= set(out)
    names = {k[0] for k in P._EXTRACTOR_CACHE}
    assert {"toy-a", "toy-b"} <= names


def test_weight_paths_routed_by_extractor_identity(toy_extractors,
                                                   monkeypatch):
    """vgg16 (the PRC default in the dual split) must receive
    vgg_weights_path, never the inception checkpoint passed as
    feature_extractor_weights_path."""
    monkeypatch.setitem(P.DEFAULT_FEATURE_EXTRACTOR, "prc", "vgg16")
    seen = {}
    real_get = P.get_feature_extractor

    def spy(name, features_list, weights_path=None, batch_size=128,
            mesh=None, internal_dtype=None):
        seen[name] = weights_path
        # route to the toy factory regardless so no real weights load
        return real_get("toy-a" if name != "toy-b" else name,
                        ("la1", "la2"), None, batch_size)

    monkeypatch.setattr(P, "get_feature_extractor", spy)
    P.calculate_metrics(
        _imgs(), _imgs(seed=3),
        fid=True, prc=True,
        feature_layer_prc="la1", feature_layer_fid="la2",
        batch_size=8,
        feature_extractor_weights_path="/path/inception.pth",
        vgg_weights_path="/path/vgg16.pth",
        cache=False,
    )
    assert seen["vgg16"] == "/path/vgg16.pth"
    # the inception-side call (defaulted to toy-a here) keeps the
    # feature-extractor path
    assert seen["toy-a"] == "/path/inception.pth"


def test_single_extractor_when_forced(toy_extractors):
    P._EXTRACTOR_CACHE.clear()
    out = P.calculate_metrics(
        _imgs(), _imgs(seed=3),
        fid=True, prc=True,
        feature_extractor="toy-a",
        batch_size=8,
        cache=False,
    )
    assert {KEY_FID, "precision"} <= set(out)
    names = {k[0] for k in P._EXTRACTOR_CACHE}
    assert names == {"toy-a"}


def test_extractor_cache_is_persistent(toy_extractors):
    a = P.get_feature_extractor("toy-a", ("la1",), batch_size=8)
    b = P.get_feature_extractor("toy-a", ("la1",), batch_size=8)
    assert a is b
    c = P.get_feature_extractor("toy-a", ("la2",), batch_size=8)
    assert c is not a


def test_ppl_flag_routes_to_calculate_ppl(toy_extractors):
    calls = {}

    def fake_ppl(model, **kw):
        calls.update(kw)
        return {"perceptual_path_length_mean": 1.5,
                "perceptual_path_length_std": 0.1}

    from fastfourierconvolution_tpu.eval import ppl as ppl_mod

    orig = ppl_mod.calculate_ppl
    ppl_mod.calculate_ppl = fake_ppl
    try:
        gm = P.GenerativeModel(
            apply=lambda z: jnp.zeros((z.shape[0], 8, 8, 3), jnp.uint8),
            z_size=4,
        )
        out = P.calculate_metrics(
            gm, ppl=True, ppl_epsilon=1e-2, input1_model_num_samples=16,
            batch_size=8, cache=False,
        )
    finally:
        ppl_mod.calculate_ppl = orig
    assert out["perceptual_path_length_mean"] == 1.5
    assert calls["epsilon"] == 1e-2
    assert calls["num_samples"] == 16


def test_fidelity_cli_npz_and_dir_inputs(tmp_path, toy_extractors, capsys):
    from PIL import Image

    from fastfourierconvolution_tpu.cli import main

    imgs = _imgs(16)
    np.savez(tmp_path / "gen.npz", images=imgs)
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    for i, im in enumerate(_imgs(16, seed=5)):
        Image.fromarray(im).save(real_dir / f"s{i:03d}.png")

    main([
        "fidelity",
        str(tmp_path / "gen.npz"),
        str(real_dir),
        "-f", "-j", "--no-cache", "--silent",
        "--feature-extractor", "toy-a",
        "-b", "8",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out[KEY_FID])


def test_fidelity_cli_prc_flags(tmp_path, toy_extractors, capsys):
    """--prc-batch-size / --save-cpu-ram plumb through the CLI into the
    chunked PRC (round 4; reference defaults.py:36,57), and tiny tile
    sizes change nothing."""
    from fastfourierconvolution_tpu.cli import main

    np.savez(tmp_path / "a.npz", images=_imgs(16, seed=1))
    np.savez(tmp_path / "b.npz", images=_imgs(16, seed=2))
    args = [
        "fidelity", str(tmp_path / "a.npz"), str(tmp_path / "b.npz"),
        "-r", "-j", "--no-cache", "--silent",
        "--feature-extractor", "toy-a", "--feature-layer-prc", "la1",
        "-b", "8",
    ]
    main(args)
    base = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(args + ["--prc-batch-size", "7", "--save-cpu-ram"])
    tiled = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # tile-size invariance up to BLAS gemm rounding (different tile
    # shapes may pick differently-blocked kernels; values are exact in
    # practice but bit-equality is not a guarantee worth flaking on)
    assert set(base) == set(tiled)
    for k in base:
        assert base[k] == pytest.approx(tiled[k], abs=1e-9), k
    assert 0.0 <= base["precision"] <= 1.0
    assert 0.0 <= base["recall"] <= 1.0


def test_fidelity_cli_requires_a_metric(tmp_path):
    from fastfourierconvolution_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["fidelity", "nonexistent-input"])


def test_fid_statistics_cache_shortcut(tmp_path, toy_extractors):
    """Only-FID calls reuse cached mu/sigma without touching features
    (reference metrics.py:68-72 have_only_fid shortcut)."""
    imgs1, imgs2 = _imgs(seed=7), _imgs(seed=8)
    kw = dict(
        fid=True, batch_size=8, cache=True, cache_dir=str(tmp_path),
        input1_cache_name="g1", input2_cache_name="r1",
        feature_extractor="toy-a",
    )
    out1 = P.calculate_metrics(imgs1, imgs2, **kw)
    stat_files = [f for f in os.listdir(tmp_path) if "stat-fid" in f]
    assert len(stat_files) == 2
    # remove the FEATURE caches; stats alone must serve the second call
    for f in os.listdir(tmp_path):
        if "features" in f:
            os.unlink(tmp_path / f)
    calls = {"n": 0}
    orig_extract = P.FeatureExtractor.extract

    def counting(self, sampler, total):
        calls["n"] += 1
        return orig_extract(self, sampler, total)

    P.FeatureExtractor.extract = counting
    try:
        out2 = P.calculate_metrics(imgs1, imgs2, **kw)
    finally:
        P.FeatureExtractor.extract = orig_extract
    assert calls["n"] == 0, "stats cache should bypass feature extraction"
    np.testing.assert_allclose(
        out1["frechet_inception_distance"],
        out2["frechet_inception_distance"],
        rtol=1e-9,
    )


def test_torchscript_generative_model_input(tmp_path, toy_extractors):
    """The reference's TorchScript .pth/.pt generative-model input kind
    (torch_fidelity/utils.py:279-286): a scripted torch module drives
    the metric pipeline — float NCHW output converted with the uint8
    eval contract, NHWC handed to the extractor."""
    import torch

    class TinyGen(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(8, 3 * 8 * 8)

        def forward(self, z):
            return torch.tanh(self.fc(z)).view(-1, 3, 8, 8)

    path = str(tmp_path / "gen.pt")
    torch.jit.save(torch.jit.trace(TinyGen(), torch.randn(2, 8)), path)
    gm = P.torchscript_generative_model(path, z_size=8)
    imgs = gm.apply(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    assert imgs.shape == (4, 8, 8, 3) and imgs.dtype == np.uint8

    out = P.calculate_metrics(
        gm, _imgs(seed=5),
        fid=True,
        input1_model_num_samples=16,
        batch_size=8,
        cache=False,
        verbose=False,
    )
    assert np.isfinite(out[KEY_FID])


def test_onnx_generative_model_input(tmp_path, toy_extractors,
                                     monkeypatch):
    """The reference's ONNX generative-model input kind
    (generative_model_onnx.py:1): an onnxruntime InferenceSession maps
    noise to images. onnxruntime isn't bundled in this image (the
    reference treats it as optional too), so the session layer is
    stubbed; this exercises the real feed-by-input-name + output
    normalisation + pipeline path."""
    import sys
    import types

    rs = np.random.RandomState(7)
    w = rs.randn(8, 3 * 8 * 8).astype(np.float32) * 0.3

    class FakeSession:
        def __init__(self, path):
            assert os.path.isfile(path)

        def get_inputs(self):
            return [types.SimpleNamespace(name="z")]

        def run(self, out_names, feeds):
            assert out_names is None and set(feeds) == {"z"}
            img = np.tanh(feeds["z"] @ w).reshape(-1, 3, 8, 8)
            return [img]

    fake = types.ModuleType("onnxruntime")
    fake.InferenceSession = FakeSession
    path = str(tmp_path / "gen.onnx")
    with open(path, "wb") as f:
        f.write(b"\x08\x07")  # placeholder bytes; session is stubbed

    # without onnxruntime importable: gated with guidance, like the
    # reference's ImportError advice (generative_model_onnx.py:33-49)
    monkeypatch.setitem(sys.modules, "onnxruntime", None)
    with pytest.raises((RuntimeError, ImportError),
                       match="onnxruntime"):
        P.onnx_generative_model(path, z_size=8)

    monkeypatch.setitem(sys.modules, "onnxruntime", fake)
    gm = P.onnx_generative_model(path, z_size=8)
    imgs = gm.apply(rs.randn(4, 8).astype(np.float32))
    assert imgs.shape == (4, 8, 8, 3) and imgs.dtype == np.uint8

    out = P.calculate_metrics(
        gm, _imgs(seed=5),
        fid=True,
        input1_model_num_samples=16,
        batch_size=8,
        cache=False,
        verbose=False,
    )
    assert np.isfinite(out[KEY_FID])


def test_fidelity_cli_torchscript_model_input(tmp_path, toy_extractors,
                                              capsys):
    """`fidelity gen.pt real.npz -f` end-to-end with the latent-spec
    flags (reference fidelity.py --input1-model-z-size etc.)."""
    import torch

    from fastfourierconvolution_tpu.cli import main

    class TinyGen(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(6, 3 * 8 * 8)

        def forward(self, z):
            return torch.tanh(self.fc(z)).view(-1, 3, 8, 8)

    path = str(tmp_path / "gen.pth")
    torch.jit.save(torch.jit.trace(TinyGen(), torch.randn(2, 6)), path)
    npz = str(tmp_path / "real.npz")
    np.savez(npz, imgs=_imgs(seed=3))
    main([
        "fidelity", path, npz, "-f", "--json", "--silent", "--no-cache",
        "--input1-model-z-size", "6",
        "--input1-model-num-samples", "16",
        "--batch-size", "8",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["frechet_inception_distance"])


def test_internal_dtype_validation():
    """The reference's feature_extractor_internal_dtype contract
    (feature_extractor_inceptionv3.py:56-64): only float32/float64/None
    are legal, and float64 demands jax x64 mode (conftest pins it off)."""
    import jax

    with pytest.raises(AssertionError):
        P.calculate_metrics(
            _imgs(), _imgs(seed=3), fid=True, batch_size=8, cache=False,
            feature_extractor_internal_dtype="bfloat16",
        )
    assert not jax.config.jax_enable_x64
    with pytest.raises(RuntimeError, match="x64"):
        P.calculate_metrics(
            _imgs(), _imgs(seed=3), fid=True, batch_size=8, cache=False,
            feature_extractor_internal_dtype="float64",
        )


@pytest.mark.slow
def test_internal_dtype_float64_matches_f32_features():
    """internal_dtype='float64' runs the real extractor end-to-end in f64
    (reference feature_extractor_inceptionv3.py:98-108: weights and input
    both cast) and agrees with the f32 pipeline to f32 tolerance — the
    param tree is init'd identically across dtypes."""
    import jax

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, size=(16, 32, 32, 3), dtype=np.uint8)
    P._EXTRACTOR_CACHE.clear()
    fe32 = P.FeatureExtractor(["192"], batch_size=8)
    f32 = fe32.extract(lambda i: imgs[i:i + 8], 16)["192"]
    with jax.enable_x64():
        fe64 = P.FeatureExtractor(
            ["192"], batch_size=8, internal_dtype="float64"
        )
        f64 = fe64.extract(lambda i: imgs[i:i + 8], 16)["192"]
    # returned features are float32 regardless of internal dtype — the
    # reference casts every tap back on return
    # (feature_extractor_inceptionv3.py:132-204), keeping cached .npz
    # features dtype-compatible across f32/f64 runs (ADVICE r3 medium)
    assert f64.dtype == np.float32
    rel = np.abs(f64.astype(np.float64) - f32).max() / (
        np.abs(f32).max() + 1e-12
    )
    assert rel < 1e-4, rel
    # end-to-end: same images through the f64 metric chain give FID ~ 0
    with jax.enable_x64():
        out = P.calculate_metrics(
            imgs, imgs[::-1].copy(), fid=True, batch_size=8, cache=False,
            input1_model_num_samples=16, input2_model_num_samples=16,
            feature_extractor_internal_dtype="float64",
        )
    assert abs(out[KEY_FID]) < 1e-6


def test_prc_orientation_generative_input1(toy_extractors):
    """PRC orientation with a generative input1 (the in-training eval
    layout): the metric convention is features_1=REAL (reference
    metric_prc.py:70) but ISC/PPL pin the generative model to input1,
    so calculate_metrics must swap the feature sets at the PRC call —
    by the explicit ``prc_input1_generated=True`` flag the trainer
    passes, and by the ``None`` auto-detect (ADVICE r4 medium)."""
    rng = np.random.RandomState(11)
    # asymmetric pair: fake = near-copy of part of real + a far mode,
    # so precision and recall land far apart (a symmetric pair cannot
    # catch a swapped orientation)
    real = rng.randint(0, 100, size=(48, 8, 8, 3), dtype=np.uint8)
    fake = np.concatenate([
        np.clip(real[:16].astype(np.int16) + rng.randint(-3, 4, (16, 8, 8, 3)),
                0, 255).astype(np.uint8),
        rng.randint(180, 256, size=(32, 8, 8, 3), dtype=np.uint8),
    ])
    kw = dict(prc=True, feature_extractor="toy-b", batch_size=16,
              cache=False, prc_neighborhood=3)

    # canonical orientation: input1 = REAL array (the fidelity-CLI and
    # reference layout) — no swap
    ref = P.calculate_metrics(real, fake, **kw)
    assert abs(ref["precision"] - ref["recall"]) > 1e-3  # asymmetric

    # trainer layout: generative model in input1, real data in input2
    served = {"i": 0}

    def apply(z):
        i = served["i"]
        served["i"] += len(z)
        return fake[i:i + len(z)]

    def gm():
        served["i"] = 0
        return P.GenerativeModel(apply=apply, z_size=4)

    got_auto = P.calculate_metrics(gm(), real,
                                   input1_model_num_samples=48, **kw)
    got_flag = P.calculate_metrics(gm(), real,
                                   input1_model_num_samples=48,
                                   prc_input1_generated=True, **kw)
    for got in (got_auto, got_flag):
        assert got["precision"] == pytest.approx(ref["precision"], abs=1e-6)
        assert got["recall"] == pytest.approx(ref["recall"], abs=1e-6)

    # forcing no-swap must yield exactly the transposed metric
    # (precision and recall exchange roles when the inputs exchange)
    got_noswap = P.calculate_metrics(gm(), real,
                                     input1_model_num_samples=48,
                                     prc_input1_generated=False, **kw)
    assert got_noswap["precision"] == pytest.approx(ref["recall"], abs=1e-6)
    assert got_noswap["recall"] == pytest.approx(ref["precision"], abs=1e-6)

    # a PLAIN callable sampler is a DATA input kind whose role is
    # ambiguous — auto-detect must NOT treat it as generated (r5
    # review): input1 = callable serving the REAL images keeps the
    # canonical orientation, bit-identical to the ndarray layout
    state = {"i": 0}

    def real_sampler(n):
        i = state["i"]
        state["i"] += n
        return real[i:i + n]

    got_call = P.calculate_metrics(real_sampler, fake,
                                   input1_model_num_samples=48, **kw)
    assert got_call["precision"] == pytest.approx(ref["precision"], abs=1e-6)
    assert got_call["recall"] == pytest.approx(ref["recall"], abs=1e-6)


def test_internal_dtype_factory_sniffing(toy_extractors):
    """internal_dtype routing to registry factories (ADVICE r4 low):
    a ``**kwargs`` factory must be detected as accepting the dtype, and
    a plain 2-arg factory given a non-f32 dtype must warn about the
    half-applied cast instead of silently dropping it."""
    import warnings

    import jax

    seen = {}

    def kwargs_factory(features_list, weights_path=None, **kwargs):
        seen.update(kwargs)
        return _ToyModule(features_list, 4), {}

    R.FEATURE_EXTRACTORS["toy-kw"] = {
        "factory": kwargs_factory, "provided": ("lk",),
    }
    try:
        with jax.enable_x64():
            P.FeatureExtractor(["lk"], name="toy-kw",
                               internal_dtype="float64")
        assert seen.get("internal_dtype") == "float64"

        # 2-arg factory + float64 -> UserWarning, still constructs
        with pytest.warns(UserWarning, match="internal_dtype"):
            with jax.enable_x64():
                P.FeatureExtractor(["la1"], name="toy-a",
                                   internal_dtype="float64")
        # float32/None stay silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            P.FeatureExtractor(["la1"], name="toy-a",
                               internal_dtype="float32")
            P.FeatureExtractor(["la1"], name="toy-a")
    finally:
        R.FEATURE_EXTRACTORS.pop("toy-kw", None)
        P._EXTRACTOR_CACHE.clear()
