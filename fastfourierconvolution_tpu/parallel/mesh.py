"""Device meshes and sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference train_cond.py:67-68,101-102). The TPU-native equivalent is a
``jax.sharding.Mesh`` with jit-compiled collectives over ICI:

  * **data axis ("dp")** — the batch dimension of real images, z vectors
    and labels is sharded; parameters are replicated; XLA inserts the
    gradient all-reduce (psum over ICI) automatically because the jitted
    loss reduces over the full logical batch. BatchNorm statistics are
    likewise computed over the full logical batch (sync-BN semantics;
    the reference's DataParallel computes per-replica stats — divergence
    documented in SURVEY §5.8, sync-BN is strictly better behaved).
  * **tensor axis ("tp")** — optional: large generator stems and the
    FourierUnit channel-mix kernels are sharded over output features,
    with XLA managing the boundary collectives.

Everything here works identically on a real TPU pod slice and on a
virtual CPU mesh (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_tensor: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert n_tensor >= 1 and len(devices) % n_tensor == 0, (
            f"n_tensor={n_tensor} must divide the device count "
            f"({len(devices)}) — a floor division would silently drop "
            f"devices from the mesh"
        )
        n_data = len(devices) // n_tensor
    assert n_data >= 1 and n_tensor >= 1, (n_data, n_tensor)
    assert n_data * n_tensor <= len(devices), (
        f"mesh {n_data}x{n_tensor} needs {n_data * n_tensor} devices, "
        f"have {len(devices)}"
    )
    arr = np.asarray(devices[: n_data * n_tensor]).reshape(n_data, n_tensor)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(sharding: NamedSharding, local_batch: np.ndarray):
    """Host-local batch slice -> global sharded array.

    Single-process (the common case, incl. all CI): a plain device_put.
    Multi-host pods: every host passes its own slice of the global batch
    (see data/loader.py process sharding) and JAX assembles the global
    array across hosts — the per-host input pipeline of SURVEY §2.8.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def shard_full_batch(sharding: NamedSharding, full_batch: np.ndarray):
    """FULL (replicated-content) host batch -> globally dp-sharded array.

    The eval-path dual of :func:`put_global_batch`: there every process
    holds only its slice (the loader shards at the source); here every
    process holds the WHOLE batch with identical content (seeded
    samplers, full local datasets) and contributes the slice its
    devices own. Assumes the mesh's dp axis orders process shards
    contiguously by process index — true for :func:`make_mesh` over
    ``jax.devices()`` (process-major ordering), the same contract
    ``put_global_batch`` relies on.
    """
    if jax.process_count() == 1:
        return jax.device_put(full_batch, sharding)
    per, rem = divmod(len(full_batch), jax.process_count())
    assert rem == 0, (
        f"batch of {len(full_batch)} must divide over "
        f"{jax.process_count()} processes"
    )
    lo = jax.process_index() * per
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(full_batch[lo : lo + per])
    )


def put_global_tree(tree, shardings):
    """Host pytree (identical values on every process, e.g. a restored
    checkpoint) -> sharded global arrays per ``shardings``.

    Single-process this is ``jax.device_put``; multi-process each
    process materialises only the shards its devices own
    (``jax.make_array_from_callback``), so restore-into-shardings works
    for leaves partitioned ACROSS processes (tp-sharded mix kernels) —
    the multi-process restore half of the reference's resume contract
    (models/ffcmodel.py:31-64).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


_REPLICATE_JITS: dict = {}


def replicate_tree(tree, mesh: Mesh):
    """Gather every leaf of ``tree`` to a FULLY REPLICATED layout on
    ``mesh`` (an on-device all_gather over ICI).

    This is the multi-process checkpoint-save path (reference resume
    contract, models/ffcmodel.py:31-64, under jax.distributed): leaves
    sharded across processes (e.g. tp-sharded FourierUnit mix kernels)
    are not host-addressable, so ``jax.device_get`` / flax
    serialisation would fail on them; after replication every process
    holds the full value and can serialise it locally. dp-only states
    are already replicated — the gather compiles to a no-op copy.

    The jitted identity is cached per (mesh, tree structure): a fresh
    ``jax.jit(lambda ...)`` per call would re-trace the full state on
    every periodic checkpoint save.
    """
    key = (mesh, jax.tree.structure(tree))
    fn = _REPLICATE_JITS.get(key)
    if fn is None:
        rep = jax.tree.map(lambda _: replicated(mesh), tree)
        fn = _REPLICATE_JITS[key] = jax.jit(lambda t: t, out_shardings=rep)
    return fn(tree)


# --- parameter partition rules ----------------------------------------------

# (regex on 'path/to/param', PartitionSpec) — first match wins; default
# replicated. Rules shard the big MXU matmuls of the FFC stack:
#   * FourierUnit mix kernels (2C, 2C): shard out-features
#   * discriminator fc kernel (mg*mg*512, 1): replicate (tiny)
#
# The generator stem Dense kernel is deliberately NOT sharded: with
# P(None, "tp") on noise_to_feature/kernel, the XLA SPMD partitioner
# mispartitions the full train-step graph (the stem reshape feeding the
# FFC channel split, under jvp) and scales loss_g by exactly the tp
# factor — isolated experimentally on the 8-device CPU mesh (stem-only
# rule: loss_g x tp; mix-only rule: bit-exact vs unsharded; the compile
# also emits "[SPMD] Involuntary full rematerialization" warnings on the
# FourierUnit complex ops). tests/test_parallel.py
# ::test_tp_matches_single_device_numerics guards this.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*mix_kernel$", P(None, "tp")),
)


def params_shardings(mesh: Mesh, params) -> object:
    """A pytree of NamedShardings for ``params`` under the tp rules.

    With ``n_tensor == 1`` every rule degenerates to full replication, so
    the same code path serves pure-dp and dp x tp runs.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for pattern, spec in _TP_RULES:
            if re.match(pattern, name):
                return spec
        return P()

    def shard_one(path, leaf):
        spec = spec_for(path)
        # Only apply tp sharding when the dimension divides evenly.
        if spec != P():
            dim = [i for i, ax in enumerate(spec) if ax == "tp"]
            tp_size = mesh.shape["tp"]
            if dim and (leaf.ndim <= dim[0] or leaf.shape[dim[0]] % tp_size):
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard_one, params)


def state_shardings(mesh: Mesh, state, g_tx=None, d_tx=None) -> object:
    """Shardings for a full GANState: params per the tp rules, optimizer
    moments mirroring their params (via optax.tree_map_params), every
    other leaf replicated."""
    import optax

    from ..train.gan import GANState, NetState  # local import, no cycle

    rep = replicated(mesh)

    def net(n: NetState, tx) -> NetState:
        p_shard = params_shardings(mesh, n.params)
        if tx is not None:
            opt_shard = optax.tree_map_params(
                tx,
                lambda _leaf, shard: shard,
                n.opt_state,
                p_shard,
                transform_non_params=lambda _leaf: rep,
            )
        else:
            opt_shard = jax.tree.map(lambda _: rep, n.opt_state)
        return NetState(
            params=p_shard,
            batch_stats=jax.tree.map(lambda _: rep, n.batch_stats),
            spectral=jax.tree.map(lambda _: rep, n.spectral),
            opt_state=opt_shard,
        )

    return GANState(
        step=rep,
        g=net(state.g, g_tx),
        d=net(state.d, d_tx),
        rng=rep,
    )
