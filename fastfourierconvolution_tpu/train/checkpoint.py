"""Checkpoint / resume.

Behavioral contract from the reference (models/ffcmodel.py:31-107,
util/save_checkpoints.py:9-33): step-tagged files
``{prefix}_{step}_steps.*`` holding model + optimizer + schedule state;
``get_latest_checkpoint`` discovers the newest by the ``(\\d+)_steps``
regex; restore returns the global step to resume from.

Implementation: the whole GANState (params, BN stats, SN vectors, both
optimizer states, PRNG key, step) serialises as one msgpack blob via
flax.serialization; writes are atomic (tempfile + rename, the reference's
utils_torch.py:25-36 pattern). The optimizer schedule needs no separate
state: it is a pure function of the step count already inside the optax
state.

Format history: checkpoints written before the FourierUnit parameter
unification (round 2, commit 07ba0ec) stored the non-fused fft path's
BN as a ``BatchNorm_0`` submodule; current trees use flat
``bn_scale``/``bn_bias`` params with top-level ``mean``/``var`` batch
stats. Restoring such a pre-unification checkpoint fails on pytree
structure mismatch — no migration shim is provided (only round-1
scratch runs ever used that layout; retrain or hand-rename
``BatchNorm_0/{scale,bias} -> bn_{scale,bias}`` and
``batch_stats/.../BatchNorm_0/{mean,var} -> {mean,var}`` if one
matters). Similarly, conditional models trained before round 3 with the
then-default conditional spectral BN need ``cond_spectral_bn=True`` at
model construction to restore.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Optional

from flax import serialization

CKPT_PATTERN = re.compile(r"(\d+)_steps\.ckpt$")


def _family_pattern(prefix: str) -> re.Pattern:
    """Match only ``{prefix}_{N}_steps.ckpt`` — discovery and pruning
    must never cross prefix families sharing a directory (the reference
    keeps e.g. netG/netD files side by side, models/ffcmodel.py:66-107)."""
    return re.compile(rf"^{re.escape(prefix)}_(\d+)_steps\.ckpt$")


def checkpoint_path(directory: str, step: int, prefix: str = "ckpt") -> str:
    return os.path.join(directory, f"{prefix}_{step}_steps.ckpt")


def get_latest_checkpoint(
    directory: str, prefix: str = "ckpt"
) -> Optional[str]:
    """Newest checkpoint file by step number, or None
    (reference util/save_checkpoints.py:9-33)."""
    if not os.path.isdir(directory):
        return None
    pat = _family_pattern(prefix)
    best_step, best_path = -1, None
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best_path = os.path.join(directory, name)
    return best_path


def save_checkpoint(
    state, directory: str, step: int, prefix: str = "ckpt", keep: int = 3
) -> str:
    """Serialise ``state`` to ``{directory}/{prefix}_{step}_steps.ckpt``
    atomically; prune to the newest ``keep`` files."""
    os.makedirs(directory, exist_ok=True)
    path = checkpoint_path(directory, step, prefix)
    data = serialization.to_bytes(state)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        # mkstemp creates 0600; restore umask-governed permissions so
        # collaborators / metric jobs under other accounts can read it
        # (plain-open semantics, like the reference's torch.save)
        umask = os.umask(0)
        os.umask(umask)
        os.chmod(tmp, 0o666 & ~umask)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    if keep > 0:
        pat = _family_pattern(prefix)
        stamped = sorted(
            (int(pat.match(n).group(1)), n)
            for n in os.listdir(directory)
            if pat.match(n)
        )
        # prune only this prefix's family, keeping the newest ``keep``
        # BY STEP — the just-written file is pruned too if older files
        # outrank it, but never another family's checkpoints
        for _, name in stamped[:-keep]:
            os.unlink(os.path.join(directory, name))
    return path


def restore_checkpoint(state_template, path: str):
    """Restore a GANState from ``path``; returns (state, step).

    ``state_template`` supplies the pytree structure (a fresh
    ``trainer.init`` result), mirroring the reference's
    restore-into-constructed-model flow (models/ffcmodel.py:31-64).
    """
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    return state, int(state.step)


def restore_latest(state_template, directory: str, prefix: str = "ckpt"):
    """Resume from the newest checkpoint in ``directory``; returns
    (state, step) or (template, 0) when none exists."""
    path = get_latest_checkpoint(directory, prefix)
    if path is None:
        return state_template, 0
    return restore_checkpoint(state_template, path)
