"""Optimizer + LR schedule.

The reference uses transformers' AdamW (betas 0.9/0.999, eps 1e-6, no weight
decay by default; train_dist_multi.py:58-64) with an out-of-band epoch-level
step decay: after every epoch, lr is RESET to
`learning_rate1 * 0.1^(#milestones passed)` where learning_rate1 comes from
the `-lr1` CLI flag (default 2e-4) and milestones from `-sc`
(trainer/trainer_dist.py:97-102). Net effect (preserved here, documented):
epoch 1 runs at the config lr, later epochs at the decayed lr1 schedule.
Set `lr_mode="config"` to decay the config lr instead (the sane variant).

The learning rate is an optax injected hyperparameter: the epoch schedule
updates `opt_state.hyperparams['learning_rate']` inside the jitted train
step, so schedule changes never trigger recompilation.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def step_decay_lr(
    epoch: int,
    base_lr: float,
    lr1: float,
    milestones: Sequence[int],
    lr_mode: str = "reference",
) -> float:
    """LR used DURING `epoch` (1-indexed), reproducing the reference's
    end-of-epoch reset semantics."""
    if lr_mode == "reference":
        if epoch <= 1:
            return base_lr
        lr = lr1
        # the reset applied at the end of epoch e governs epoch e+1
        for m in milestones:
            if (epoch - 1) >= m:
                lr *= 0.1
        return lr
    # "config": decay the config lr at the milestones
    lr = base_lr
    for m in milestones:
        if epoch > m:
            lr *= 0.1
    return lr


class PackedState(NamedTuple):
    inner: Any


def pack_small_leaves(
    tx: optax.GradientTransformation, threshold: int = 8192
) -> optax.GradientTransformation:
    """Run `tx` on a tree where all small float32 leaves are concatenated
    into ONE flat vector.

    AdamW's update is elementwise per-parameter (weight decay here is
    unmasked), so packing is numerically EXACT — it only changes the kernel
    launch structure: the param tree has ~200 leaves, most of them tiny
    biases/LayerNorm vectors, and per-leaf optimizer fusions pay a fixed
    per-kernel overhead that measured ~40% over the HBM-traffic floor of the
    donated update (BENCH_NOTES.md round 3, 8.9 ms vs 5.2 ms at 153.4M
    params). Packing replaces ~N small fusions with one, at the cost of one
    ravel/concat + split/reshape round-trip over only the small leaves' bytes
    (a few MB). (With clip_by_global_norm in the chain the global-norm
    reduction ORDER changes — same math, float-associativity ulps.)

    The packed structure is derived from the tree's static shapes at every
    call, so it is stable under jit. Under tensor parallelism the packed
    vector's optimizer state falls back to replicated (parallel/tp.py
    path-based rules), which is where small leaves live anyway.
    """

    def _plan(tree):
        """Packing plan from a tree's static shapes/dtypes. ONE plan is used
        per update for both the grads and the params trees (they must agree
        leaf-for-leaf — asserted in _pack — so adamw's weight-decay term can
        never pair a packed update with a misaligned packed param)."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        small = [
            i
            for i, l in enumerate(leaves)
            if l.size <= threshold and l.dtype == jnp.float32
        ]
        return treedef, leaves, set(small), small

    def _pack(tree, plan):
        treedef, plan_leaves, small_set, small = plan
        leaves = jax.tree_util.tree_leaves(tree)
        assert len(leaves) == len(plan_leaves)
        for l, pl in zip(leaves, plan_leaves):
            assert l.shape == pl.shape and l.dtype == pl.dtype, (
                "pack_small: tree disagrees with the packing plan "
                f"({l.shape}/{l.dtype} vs {pl.shape}/{pl.dtype})"
            )
        big = tuple(l for i, l in enumerate(leaves) if i not in small_set)
        if small:
            packed = jnp.concatenate([jnp.ravel(leaves[i]) for i in small])
        else:
            packed = jnp.zeros((0,), jnp.float32)
        return (big, packed)

    def _unpack(packed_tree, plan):
        treedef, leaves, small_set, small = plan
        big, packed = packed_tree
        big_iter = iter(big)
        offsets = {}
        off = 0
        for i in small:
            offsets[i] = off
            off += leaves[i].size
        out = []
        for i, l in enumerate(leaves):
            if i in small_set:
                o = offsets[i]
                out.append(packed[o: o + l.size].reshape(l.shape))
            else:
                out.append(next(big_iter))
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        plan = _plan(params)
        return PackedState(inner=tx.init(_pack(params, plan)))

    def update_fn(updates, state, params=None):
        plan = _plan(updates)
        pu = _pack(updates, plan)
        pp = _pack(params, plan) if params is not None else None
        new_u, new_inner = tx.update(pu, state.inner, pp)
        return _unpack(new_u, plan), PackedState(inner=new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


class ReferenceAdamWState(NamedTuple):
    count: Any
    mu: Any
    nu: Any


def _reference_adamw_core(learning_rate, b1, b2, eps, weight_decay,
                          mu_dtype=None):
    """transformers' legacy AdamW update math, EXACTLY (the reference's
    actual optimizer: train_dist_multi.py:64 builds from the transformers
    module, requirements.txt pins transformers==4.10.0, whose
    optimization.AdamW.step applies bias correction as a step-size factor
    over an UNcorrected denominator):

        m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2
        p <- p - lr * (sqrt(1-b2^t)/(1-b1^t)) * m / (sqrt(v) + eps)
        p <- p - lr * wd * p          # decay on the POST-step p, at raw lr

    optax.adamw instead corrects inside the root (m_hat/(sqrt(v_hat)+eps)):
    the effective eps differs by 1/sqrt(1-b2^t) — ~32x at step 1 with
    eps=1e-6, decaying to parity over ~1/(1-b2) steps. Pinned by
    tests/test_optimizer_parity.py; deviation documented as PARITY.md #17.
    """

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ReferenceAdamWState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("reference_exact AdamW needs params (weight decay)")
        count = state.count + 1
        t = count.astype(jnp.float32)
        # bias correction as a step-size factor (transformers 4.10
        # optimization.py: step_size * sqrt(bias_correction2)/bias_correction1)
        step_size = learning_rate * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(g.dtype) + (1.0 - b1) * g,
            state.mu, grads,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads
        )

        def upd(m, v, p):
            delta = -step_size * m / (jnp.sqrt(v) + eps)
            # sequential decay semantics: applied to the post-step param
            return delta - learning_rate * weight_decay * (p + delta)

        updates = jax.tree_util.tree_map(upd, mu, nu, params)
        if mu_dtype is not None:
            mu = jax.tree_util.tree_map(
                lambda m: m.astype(mu_dtype), mu
            )
        return updates, ReferenceAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw(
    learning_rate, b1, b2, eps, weight_decay, max_grad_norm=None,
    mu_dtype=None, pack_small=False, reference_exact=False,
):
    if reference_exact:
        tx = _reference_adamw_core(
            learning_rate, b1, b2, eps, weight_decay, mu_dtype=mu_dtype
        )
    else:
        tx = optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if pack_small:
        # truthy-int values above the default act as the packing threshold
        # (an ablation surface: a huge threshold packs EVERY f32 leaf,
        # measuring whether the per-fusion overhead of the ~60 LARGE leaves
        # is worth the pack/unpack concat traffic — see BENCH_NOTES)
        thr = (
            int(pack_small)
            if isinstance(pack_small, int) and not isinstance(pack_small, bool)
            and int(pack_small) > 1
            else 8192
        )
        tx = pack_small_leaves(tx, threshold=thr)
    return tx


def make_optimizer(
    lr: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    max_grad_norm: float | None = None,
    mu_dtype: str | None = None,
    pack_small: bool = False,
    reference_exact: bool = False,
) -> optax.GradientTransformation:
    """AdamW matching transformers.AdamW defaults, learning rate injected.

    reference_exact: opt-in bit-faithful reproduction of transformers 4.10's
    AdamW update math (uncorrected denominator + step-size bias correction +
    post-step weight decay — see _reference_adamw_core). Default False =
    optax.adamw (corrected denominator); the difference is an effective-eps
    schedule, measured and bounded in PARITY.md #17.

    mu_dtype: storage dtype for the first moment (e.g. "bfloat16" halves its
    HBM traffic/footprint — ~4 B/param of the 28 B/param update stream).
    Default None = f32 = exact reference numerics (torch AdamW keeps f32
    state); opt-in via the config's optimizer args.

    pack_small: run the update with all small leaves packed into one flat
    vector (see pack_small_leaves) — numerically exact, fewer tiny fusions.
    Data-parallel knob: under tensor parallelism (mesh model>1) the packed
    opt-state tuple hides the leaf names parallel/tp.py matches on, so the
    big leaves' mu/nu would fall back to replicated — keep it off there.
    """
    return optax.inject_hyperparams(
        _adamw,
        static_args=("max_grad_norm", "mu_dtype", "pack_small",
                     "reference_exact"),
    )(
        learning_rate=lr,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        max_grad_norm=max_grad_norm,
        mu_dtype=None if mu_dtype is None else jnp.dtype(mu_dtype),
        pack_small=pack_small,
        reference_exact=reference_exact,
    )
