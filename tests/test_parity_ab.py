"""Lockstep training-parity test vs the reference loop (VERDICT round 1,
next-round item 4): the reference's own fgan_complete recipe (torch CPU,
classes exec'd from /root/reference) and this framework's GANTrainer run
20 global steps from converted identical init on identical batches and
latent draws; the per-step loss trajectories must agree.

This is the strongest end-to-end parity evidence available in this
sealed environment: it exercises the FFC/FFT forwards, BN batch
statistics, spectral-norm power-iteration cadence, hinge losses, AdamW
and the linear lr schedule *jointly over time*, not just single
forwards. The 500-step artifact lives in RUNS/parity_ab/
(tests/parity_ab.py is the harness)."""

from __future__ import annotations

import numpy as np
import pytest

import parity_ab

pytestmark = pytest.mark.slow

STEPS = 20
BATCH = 16
MG = 2


def test_lockstep_losses_match_reference():
    batches = parity_ab.make_batches(STEPS, BATCH, MG * 8)
    zs = parity_ab.make_zs(STEPS, BATCH)
    G, D = parity_ab.init_reference_nets(MG)
    sd_g = {k: v.clone() for k, v in G.state_dict().items()}
    sd_d = {k: v.clone() for k, v in D.state_dict().items()}

    ref = parity_ab.run_reference_loop(G, D, batches, zs, total_steps=STEPS)
    ours = parity_ab.run_ours_loop(
        sd_g, sd_d, batches, zs, total_steps=STEPS, mg=MG
    )

    ld_r = np.array(ref["loss_d"])
    ld_o = np.array(ours["loss_d"])
    lg_r = np.array(ref["loss_g"])
    lg_o = np.array(ours["loss_g"])

    # GAN dynamics are chaotic: f32 accumulation-order noise (~1e-6)
    # amplifies ~2-3x per step (measured in RUNS/parity_ab), so exact
    # lockstep is asserted over the first 10 steps — wrong BN/SN/
    # optimizer semantics shift losses by >1e-1 within a few steps,
    # far above this tolerance
    assert np.abs(ld_r[:10] - ld_o[:10]).max() < 2e-2, (
        f"D-loss lockstep broken: {np.abs(ld_r[:10] - ld_o[:10])}"
    )
    assert np.abs(lg_r[:10] - lg_o[:10]).max() < 4e-2, (
        f"G-loss lockstep broken: {np.abs(lg_r[:10] - lg_o[:10])}"
    )
    # the full-window trajectories must stay in the same regime
    assert abs(ld_r.mean() - ld_o.mean()) < 0.5
    # trajectories must actually move (non-vacuous)
    assert np.abs(np.diff(ld_r)).max() > 1e-3


@pytest.mark.slow
def test_deep_tap_metric_parity_calibrated():
    """The '2048' tap — the actual FID protocol layer (reference
    metric_fid.py:32-46, feature_extractor_inceptionv3.py:212-218) —
    must agree with the reference pipeline end-to-end under the
    calibrated variance-preserving weights (VERDICT r2 item 2; the
    round-2 seeded weights collapsed deep taps to 24% disagreement).
    Small-n regression guard for the full RUNS/parity_ab artifact."""
    import tempfile

    from metric_ab import run_metric_ab

    with tempfile.TemporaryDirectory() as td:
        # mix_b: partial manifold overlap so PRC is informative
        table = run_metric_ab(td, n=96, layers=("2048",),
                              kid_subsets=5, kid_subset_size=48,
                              mix_b=True)
    rd = table["2048"]["rel_diff"]
    assert rd["fid"] < 2e-2, table["2048"]
    assert rd["isc"] < 2e-2, table["2048"]
    assert rd["kid"] < 5e-2, table["2048"]
    # PRC through the FULL pipeline (round 4): the orientation routing
    # (input1 -> features_1 = REAL, metric_prc.py:70) is what the
    # round-3 bug swapped — catch any regression at the pipeline level
    assert rd["precision"] < 5e-2, table["2048"]
    assert rd["recall"] < 5e-2, table["2048"]
    # non-degeneracy: the two distributions must be separated and ISC
    # must not be pinned at 1 (the round-2 collapse signature)
    assert table["2048"]["reference"]["fid"] > 10.0
    assert table["2048"]["reference"]["isc"] > 1.0005
    # asymmetry guard: equal precision/recall would mask a swap
    ref = table["2048"]["reference"]
    assert abs(ref["precision"] - ref["recall"]) > 1e-3, ref
