"""GAN training: state container + one fully jitted update step.

Replicates the behavioral contract of the reference's hot loop
(reference fgan_complete.py:357-406): per global step, one generator
update followed by ``num_dis_updates`` discriminator updates, each on a
fresh z batch, hinge losses, AdamW(lr, betas=(0.5, 0.999)) with linear
lr decay ``1 - step/total`` (LambdaLR, fgan_complete.py:315-319).

TPU-native design:
  * the whole (G-step + D-steps) sequence is ONE jitted function — no
    host round-trips between sub-updates;
  * all stochastic state flows from an explicit PRNG key carried in the
    train state;
  * BN running stats and spectral-norm u vectors are carried as
    collections and threaded through every forward exactly as torch's
    in-place buffer updates would (G's BN stats update during both the
    G-step and the D-step forwards; D's SN u advances on every D forward
    in train mode);
  * data parallelism comes from jit + NamedSharding on the batch — XLA
    inserts the gradient all-reduce over ICI (see parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from . import losses as L


@struct.dataclass
class NetState:
    """Parameters + auxiliary collections for one network."""

    params: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any


@struct.dataclass
class GANState:
    step: jax.Array
    g: NetState
    d: NetState
    rng: jax.Array


def linear_decay_schedule(base_lr: float, total_steps: int):
    """lr(step) = base_lr * (1 - step/total): the reference LambdaLR."""

    def schedule(step):
        frac = 1.0 - step.astype(jnp.float32) / float(total_steps)
        return base_lr * jnp.maximum(frac, 0.0)

    return schedule


def make_optimizer(
    lr: float = 2e-4,
    total_steps: int = 100_000,
    b1: float = 0.5,
    b2: float = 0.999,
    weight_decay: float = 0.01,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW with linear decay (reference fgan_complete.py:315-319);
    ``kind='adam'`` for the sngan_complete/train_cond recipes."""
    schedule = linear_decay_schedule(lr, total_steps)
    if kind == "adamw":
        return optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    if kind == "adam":
        return optax.adam(schedule, b1=b1, b2=b2)
    raise ValueError(kind)


LOSS_PAIRS = {
    "hinge": (L.hinge_loss_gen, L.hinge_loss_dis),
    "bce": (L.bce_loss_gen, L.bce_loss_dis),
    "wgan": (L.wgan_loss_gen, L.wgan_loss_dis),
    # wgan-gp: wgan pair + gradient penalty added in the D update
    # (reference benchmark_models/sagan/trainer.py:107-148)
    "wgan-gp": (L.wgan_loss_gen, L.wgan_loss_dis),
}

# real/fake D-loss terms for the aw-method's two-gradient combination
# (reference layers/aw_loss.py:13-107 computes separate backward passes
# for Dloss_real and Dloss_fake)
LOSS_SPLIT = {
    "hinge": (
        lambda real: jnp.mean(jax.nn.relu(1.0 - real.astype(jnp.float32))),
        lambda fake: jnp.mean(jax.nn.relu(1.0 + fake.astype(jnp.float32))),
    ),
    "bce": (
        lambda real: L.bce_loss(real, 1.0),
        lambda fake: L.bce_loss(fake, 0.0),
    ),
    "wgan": (
        lambda real: -jnp.mean(real.astype(jnp.float32)),
        lambda fake: jnp.mean(fake.astype(jnp.float32)),
    ),
}


class GANTrainer:
    """Builds init/update functions for a (generator, discriminator) pair.

    ``g_model``/``d_model`` are flax modules with signature
    ``__call__(x, train)`` (or ``(x, train, y)`` when ``conditional``).
    """

    def __init__(
        self,
        g_model,
        d_model,
        z_size: int = 128,
        lr: float = 2e-4,
        total_steps: int = 100_000,
        num_dis_updates: int = 1,
        loss: str = "hinge",
        optimizer: str = "adamw",
        b1: float = 0.5,
        b2: float = 0.999,
        conditional: bool = False,
        num_classes: int = 0,
        d_lr: Optional[float] = None,
        fused_dis_batch: bool = False,
        gp_lambda: float = 10.0,
        aw_method: bool = False,
        update_order: str = "g_first",
        aw_alpha1: float = 0.5,
        aw_alpha2: float = 0.75,
        aw_delta: float = 0.05,
        aw_epsilon: float = 0.05,
        remat: Optional[str] = None,
        d_progress_arg: bool = False,
    ):
        self.g_model = g_model
        self.d_model = d_model
        self.z_size = z_size
        self.num_dis_updates = num_dis_updates
        self.total_steps = total_steps
        # pass training progress (step/total) as the D's 4th argument —
        # the library-path CondDCGANDiscriminator's decaying input noise
        # 0.1*0.01**progress needs it (reference cond_discriminator.py
        # get_noise_decay + train_cond.py threading epoch into forward)
        self.d_progress_arg = d_progress_arg
        self.conditional = conditional
        self.num_classes = num_classes
        self.loss_name = loss
        assert update_order in ("g_first", "d_first"), update_order
        self.update_order = update_order
        self.use_gp = loss == "wgan-gp"
        self.gp_lambda = gp_lambda
        self.aw_method = aw_method
        self.aw_params = (aw_alpha1, aw_alpha2, aw_delta, aw_epsilon)
        if aw_method:
            assert loss in LOSS_SPLIT, f"aw-method unsupported for {loss}"
            assert not fused_dis_batch, (
                "aw-method needs separate real/fake D passes"
            )
        # One concatenated D forward over [fake; real] instead of two.
        # Halves the D kernel count per update — safe for BN-free
        # discriminators (the SN family); keep False for BN'd ones, whose
        # per-batch statistics it would mix. Reference parity note: torch
        # runs one SN power iteration per forward, so fusing also means 1
        # iteration instead of 2 per D step (inconsequential).
        self.fused_dis_batch = fused_dis_batch
        # Activation rematerialisation of the differentiated model
        # applies: a memory-headroom knob for configs whose backward
        # activations don't fit HBM (large batch / >128px ladders).
        # 'dots' keeps matmul/conv outputs and recomputes elementwise
        # chains; 'full' recomputes everything. Measured on the fgan128
        # step (v5e): 'dots' cuts peak temp memory 3.54->3.11 GB (-12%)
        # at +20% step time — leave None unless memory-bound. Same math
        # as remat=None; only XLA fusion grouping (last-ulp f32
        # rounding) differs (test_train_step.py::test_remat_matches_...).
        assert remat in (None, "none", "dots", "full"), remat
        self.remat = None if remat in (None, "none") else remat
        self.gen_loss, self.dis_loss = LOSS_PAIRS[loss]
        self.g_tx = make_optimizer(lr, total_steps, b1, b2, kind=optimizer)
        # D's optax step count advances num_dis_updates times per global
        # step; stretch its schedule so the per-global-step decay matches
        # the reference's once-per-step scheduler_D.step().
        self.d_tx = make_optimizer(
            d_lr or lr, total_steps * num_dis_updates, b1, b2, kind=optimizer
        )

    # -- helpers -------------------------------------------------------------

    def _maybe_remat(self, fn: Callable, static_argnums) -> Callable:
        """Wrap a model apply in jax.checkpoint per ``self.remat``.

        Only used inside the differentiated loss closures — remat of an
        un-differentiated call is a no-op. ``prevent_cse=True`` is
        required for the memory effect: measured on the fgan128 step,
        ``prevent_cse=False`` lets XLA's CSE merge the recomputation
        back with the forward, reproducing the no-remat HLO exactly
        (identical temp-memory and step time).
        """
        if self.remat is None:
            return fn
        policy = (
            jax.checkpoint_policies.dots_saveable
            if self.remat == "dots"
            else None
        )
        return jax.checkpoint(
            fn, policy=policy, prevent_cse=True,
            static_argnums=static_argnums,
        )

    def _g_vars(self, g: NetState) -> Dict:
        v = {"params": g.params}
        if g.batch_stats is not None:
            v["batch_stats"] = g.batch_stats
        if g.spectral is not None:
            v["spectral"] = g.spectral
        return v

    def _apply_g(self, g_vars, z, rng, train=True, y=None):
        mutable = [k for k in ("batch_stats", "spectral") if k in g_vars]
        args = (z, train, y) if self.conditional else (z, train)
        out, updates = self.g_model.apply(
            g_vars, *args, rngs={"noise": rng}, mutable=mutable
        )
        return out, updates

    def _apply_d(self, d_vars, x, train=True, y=None, rng=None,
                 progress=None):
        mutable = [k for k in ("batch_stats", "spectral") if k in d_vars]
        args = (x, train, y) if self.conditional else (x, train)
        if progress is not None:
            args = args + (progress,)
        rngs = {"noise": rng} if rng is not None else None
        out, updates = self.d_model.apply(
            d_vars, *args, rngs=rngs, mutable=mutable
        )
        return out, updates

    @staticmethod
    def _merge(vars_dict, updates):
        merged = dict(vars_dict)
        merged.update(updates)
        return merged

    # -- init ------------------------------------------------------------------

    def init(self, rng: jax.Array, sample_batch: jax.Array) -> GANState:
        """Initialise both networks' variables and optimizers.

        ``sample_batch``: a (B, H, W, C) array with the real-data shape
        (only shapes/dtypes matter).
        """
        rng, g_rng, d_rng, z_rng, n_rng = jax.random.split(rng, 5)
        # init shapes don't depend on batch size: use a tiny batch so the
        # (jitted) init trace is cheap even for large training batches
        b = 2
        z = jax.random.normal(z_rng, (b, self.z_size))
        sample_small = jnp.zeros((b,) + sample_batch.shape[1:],
                                 sample_batch.dtype)
        y = (
            jnp.zeros((b,), jnp.int32)
            if self.conditional
            else None
        )
        g_args = (z, True, y) if self.conditional else (z, True)
        g_variables = jax.jit(self.g_model.init, static_argnums=2)(
            {"params": g_rng, "noise": n_rng}, *g_args
        )
        d_args = (
            (sample_small, True, y) if self.conditional else (sample_small, True)
        )
        d_variables = jax.jit(self.d_model.init, static_argnums=2)(
            {"params": d_rng, "noise": n_rng}, *d_args
        )

        def net_state(variables, tx):
            params = variables["params"]
            return NetState(
                params=params,
                batch_stats=variables.get("batch_stats"),
                spectral=variables.get("spectral"),
                opt_state=tx.init(params),
            )

        return GANState(
            step=jnp.zeros((), jnp.int32),
            g=net_state(g_variables, self.g_tx),
            d=net_state(d_variables, self.d_tx),
            rng=rng,
        )

    # -- one global step ---------------------------------------------------------

    def update_step(
        self, state: GANState, real: jax.Array,
        labels: Optional[jax.Array] = None,
        zs: Optional[jax.Array] = None,
    ) -> Tuple[GANState, Dict[str, jax.Array]]:
        """One generator update + num_dis_updates discriminator updates.

        ``update_order='g_first'`` (default) is the *_complete.py loop
        (G update, then D updates, reference fgan_complete.py:367-393);
        ``'d_first'`` is the train_cond.py / SAGAN comparator ordering
        (D updates on the current G, then the G update, reference
        train_cond.py:169-220, sagan/trainer.py:107-163).

        ``zs`` (testing hook, shape (1 + num_dis_updates, B, z_size))
        overrides the per-phase latent draws — zs[0] feeds the G update
        and zs[1:] the D updates — so A/B parity harnesses can run this
        trainer in lockstep with the reference loop on shared noise.

        Jit this (optionally with shardings); it is pure.
        """
        rng = state.rng
        progress = (
            state.step.astype(jnp.float32) / float(self.total_steps)
            if self.d_progress_arg
            else None
        )
        z_g = zs[0] if zs is not None else None
        z_d = zs[1:] if zs is not None else None
        if self.update_order == "d_first":
            g_state, d_state, loss_d, rng = self._d_phase(
                state.g, state.d, rng, real, labels, progress, z_d
            )
            g_state, d_state, loss_g, rng = self._g_phase(
                g_state, d_state, rng, real.shape[0], labels, progress, z_g
            )
        else:
            g_state, d_state, loss_g, rng = self._g_phase(
                state.g, state.d, rng, real.shape[0], labels, progress, z_g
            )
            g_state, d_state, loss_d, rng = self._d_phase(
                g_state, d_state, rng, real, labels, progress, z_d
            )
        new_state = GANState(
            step=state.step + 1, g=g_state, d=d_state, rng=rng
        )
        return new_state, {"loss_g": loss_g, "loss_d": loss_d}

    def _g_phase(self, g_in: NetState, d_in: NetState, rng, b, labels,
                 progress=None, z_override=None):
        """One generator update (also advances D's aux collections from
        its forward on the fakes, like torch's in-place buffers)."""
        rng, z_rng, noise_rng, d_noise_rng = jax.random.split(rng, 4)
        z = (
            z_override
            if z_override is not None
            else jax.random.normal(z_rng, (b, self.z_size))
        )
        g_aux_in = self._g_vars(g_in)
        d_vars = self._g_vars(d_in)

        apply_g = self._maybe_remat(self._apply_g, (3,))
        apply_d = self._maybe_remat(self._apply_d, (2,))

        def g_loss_fn(g_params):
            g_vars = dict(g_aux_in)
            g_vars["params"] = g_params
            fake, g_updates = apply_g(g_vars, z, noise_rng, True, labels)
            logits, d_updates = apply_d(
                d_vars, fake, True, labels, d_noise_rng, progress
            )
            return self.gen_loss(logits), (g_updates, d_updates)

        (loss_g, (g_updates, d_updates)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_in.params)

        g_upd, g_opt_state = self.g_tx.update(
            g_grads, g_in.opt_state, g_in.params
        )
        g_params = optax.apply_updates(g_in.params, g_upd)
        g_state = NetState(
            params=g_params,
            batch_stats=g_updates.get("batch_stats", g_in.batch_stats),
            spectral=g_updates.get("spectral", g_in.spectral),
            opt_state=g_opt_state,
        )
        d_state = NetState(
            params=d_in.params,
            batch_stats=d_updates.get("batch_stats", d_in.batch_stats),
            spectral=d_updates.get("spectral", d_in.spectral),
            opt_state=d_in.opt_state,
        )
        return g_state, d_state, loss_g, rng

    def _d_phase(self, g_state: NetState, d_state: NetState, rng, real,
                 labels, progress=None, z_overrides=None):
        """num_dis_updates discriminator updates on fakes from the
        current generator (G's aux collections advance per forward)."""
        b = real.shape[0]
        loss_d = jnp.zeros(())
        for d_iter in range(self.num_dis_updates):
            rng, z_rng, noise_rng, dn1, dn2, gp_rng = jax.random.split(rng, 6)
            z = (
                z_overrides[d_iter]
                if z_overrides is not None
                else jax.random.normal(z_rng, (b, self.z_size))
            )
            g_vars = self._g_vars(g_state)
            fake, g_updates = self._apply_g(g_vars, z, noise_rng, y=labels)
            fake = jax.lax.stop_gradient(fake)
            g_state = g_state.replace(
                batch_stats=g_updates.get("batch_stats", g_state.batch_stats),
                spectral=g_updates.get("spectral", g_state.spectral),
            )
            d_aux_in = self._g_vars(d_state)
            apply_d = self._maybe_remat(self._apply_d, (2,))

            def d_loss_fn(d_params):
                dv = dict(d_aux_in)
                dv["params"] = d_params
                if self.fused_dis_batch:
                    both = jnp.concatenate([fake, real], axis=0)
                    y2 = (
                        jnp.concatenate([labels, labels], axis=0)
                        if labels is not None
                        else None
                    )
                    logits, upd = apply_d(dv, both, True, y2, dn1, progress)
                    fake_logits, real_logits = jnp.split(logits, 2, axis=0)
                    loss = self.dis_loss(fake_logits, real_logits)
                else:
                    fake_logits, upd1 = apply_d(
                        dv, fake, True, labels, dn1, progress
                    )
                    dv2 = self._merge(dv, upd1)
                    real_logits, upd2 = apply_d(
                        dv2, real, True, labels, dn2, progress
                    )
                    loss = self.dis_loss(fake_logits, real_logits)
                    upd = self._merge(upd1, upd2)
                if self.use_gp:
                    # WGAN-GP (reference sagan/trainer.py:130-148):
                    # double-backprop through D on interpolates; the
                    # collection updates of this extra pass are discarded.
                    # remat applies here too — the GP double-backprop is
                    # the dominant activation-memory consumer of this loss
                    def d_of_x(x):
                        logits, _ = apply_d(dv, x, True, labels, dn1,
                                            progress)
                        return logits

                    loss = loss + self.gp_lambda * L.gradient_penalty(
                        d_of_x, real, fake, gp_rng
                    )
                return loss, upd

            def aw_grads(d_params):
                """Two separate real/fake gradient passes combined with
                the aw-method (reference layers/aw_loss.py Alg. 1)."""
                real_term, fake_term = LOSS_SPLIT[self.loss_name]

                def real_fn(p):
                    dv = dict(d_aux_in)
                    dv["params"] = p
                    logits, upd = apply_d(dv, real, True, labels, dn2,
                                          progress)
                    return real_term(logits), (logits, upd)

                def fake_fn(p):
                    dv = dict(d_aux_in)
                    dv["params"] = p
                    logits, upd = apply_d(dv, fake, True, labels, dn1,
                                          progress)
                    return fake_term(logits), (logits, upd)

                (l_r, (real_logits, upd_r)), g_r = jax.value_and_grad(
                    real_fn, has_aux=True
                )(d_params)
                (l_f, (fake_logits, upd_f)), g_f = jax.value_and_grad(
                    fake_fn, has_aux=True
                )(d_params)
                a1, a2, delta, eps = self.aw_params
                combined, _w_r, _w_f = L.aw_combine(
                    g_r, g_f, real_logits, fake_logits,
                    alpha1=a1, alpha2=a2, delta=delta, epsilon=eps,
                )
                return l_r + l_f, self._merge(upd_f, upd_r), combined

            if self.aw_method:
                loss_d, d_updates, d_grads = aw_grads(d_state.params)
            else:
                (loss_d, d_updates), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True
                )(d_state.params)
            d_upd, d_opt_state = self.d_tx.update(
                d_grads, d_state.opt_state, d_state.params
            )
            d_params = optax.apply_updates(d_state.params, d_upd)
            d_state = NetState(
                params=d_params,
                batch_stats=d_updates.get("batch_stats", d_state.batch_stats),
                spectral=d_updates.get("spectral", d_state.spectral),
                opt_state=d_opt_state,
            )
        return g_state, d_state, loss_d, rng

    def update_steps(
        self,
        state: GANState,
        reals: jax.Array,
        labels: Optional[jax.Array] = None,
    ) -> Tuple[GANState, Dict[str, jax.Array]]:
        """K chained update steps under one jit via lax.scan.

        ``reals``: (K, B, H, W, C); ``labels``: (K, B) when conditional.
        Amortises per-step dispatch overhead (a real cost on small
        batches); returns per-step metric arrays of shape (K,).
        """

        def body(s, xs):
            if labels is not None:
                r, y = xs
                s2, m = self.update_step(s, r, y)
            else:
                s2, m = self.update_step(s, xs)
            return s2, m

        xs = (reals, labels) if labels is not None else reals
        return jax.lax.scan(body, state, xs)

    # -- sampling ----------------------------------------------------------------

    def generate(
        self,
        state: GANState,
        z: jax.Array,
        labels: Optional[jax.Array] = None,
        uint8: bool = False,
    ) -> jax.Array:
        """Eval-mode generation (BN running stats, no noise injection);
        ``uint8=True`` applies the metric-pipeline output contract."""
        g_vars = self._g_vars(state.g)
        args = (z, False, labels) if self.conditional else (z, False)
        out = self.g_model.apply(
            g_vars, *args, rngs={"noise": jax.random.PRNGKey(0)}
        )
        if uint8:
            from ..models.ffc_gan import to_uint8

            out = to_uint8(out)
        return out
