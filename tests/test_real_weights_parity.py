"""Real-weights drop-in drill (VERDICT r3 item 3): when the actual
torch-fidelity InceptionV3 checkpoint exists locally, the full
ours-vs-reference FID/ISC/KID table at the protocol layers must agree
to < 1e-3 relative. Skipped on zero-egress hosts where no checkpoint
can exist — tools/real_weights_parity.py is the one-command version and
records the search evidence when skipping."""

import importlib.util
import os

import pytest

from fastfourierconvolution_tpu.eval.inception import find_local_weights

pytestmark = pytest.mark.slow

_WEIGHTS = find_local_weights()


def _load_tool():
    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "real_weights_parity.py"
    )
    spec = importlib.util.spec_from_file_location("real_weights_parity", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    _WEIGHTS is None,
    reason="no real InceptionV3 checkpoint on this host (zero egress); "
    "drop weights-inception-2015-12-05-6726825d.pth and re-run — "
    "see tools/real_weights_parity.py",
)
def test_real_weights_full_parity_table():
    tool = _load_tool()
    table = tool.run_real_weights_parity(_WEIGHTS, n=128)
    assert max(table["rel_diff"].values()) < 1e-3, table


def test_real_weights_drill_machinery_with_calibrated_pth(tmp_path):
    """The drill's code path proven end-to-end even without real
    weights: a calibrated stand-in .pth takes the exact route the real
    checkpoint will — torch.load -> vendored reference extractor on one
    side, the production converter -> our pipeline on the other — and
    the deep protocol-layer table must agree. The day real weights
    drop, only the file changes."""
    import numpy as np

    import metric_ab

    tool = _load_tool()
    from fastfourierconvolution_tpu.data.datasets import (
        ShapesDataset,
        SyntheticDataset,
    )

    n, size = 96, 32
    calib = np.concatenate([
        ShapesDataset(n=n // 2, size=size, seed=21).images,
        SyntheticDataset(n=n // 2, size=size, seed=22).images,
    ])
    _, pth = metric_ab.build_calibrated_extractor_pth(
        str(tmp_path), ["2048", "logits_unbiased"], calib
    )
    table = tool.run_real_weights_parity(
        pth, n=n, size=size, kid_subset_size=64
    )
    assert max(table["rel_diff"].values()) < 1e-3, table
