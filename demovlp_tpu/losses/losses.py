"""Training objectives.

Pure functions plus thin stateless classes (so the config registry can
instantiate them by name with the reference's config args — e.g.
`{"type": "GlobalLocalLoss", "args": {...}}`).

Behavior spec: reference model/loss.py. All losses are pure jnp and safe to
call inside jit; because the jitted train step sees the *global* batch under
GSPMD, contrastive negatives automatically span all devices (the upgrade of
the reference's dormant AllGather_multi, trainer/trainer_dist.py:13-31).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from demovlp_tpu.ops.xattn import xattn_score


def norm_softmax_loss(sim, temperature: float = 0.05, valid=None):
    """Bidirectional InfoNCE on a cosine-similarity matrix
    (reference model/loss.py:119-138).

    valid: optional (N,) 0/1 row/col validity mask. Masked entries are
    excluded from the softmax normalizations and the diagonal means; the
    result equals the loss of sim[:n, :n] when the first n rows are valid
    (used by eval on padded tail batches — the train path passes None and
    is byte-identical to before)."""
    if valid is None:
        i_logsm = jax.nn.log_softmax(sim / temperature, axis=1)
        j_logsm = jax.nn.log_softmax(sim.T / temperature, axis=1)
        loss_i = jnp.mean(jnp.diag(i_logsm))
        loss_j = jnp.mean(jnp.diag(j_logsm))
        return -loss_i - loss_j
    vbool = valid.astype(bool)
    neg = jnp.where(vbool, 0.0, -jnp.inf).astype(sim.dtype)
    i_logsm = jax.nn.log_softmax(sim / temperature + neg[None, :], axis=1)
    j_logsm = jax.nn.log_softmax(sim.T / temperature + neg[None, :], axis=1)
    n_valid = jnp.sum(valid.astype(sim.dtype))
    # diag entries of valid rows are finite (their column is valid too)
    loss_i = jnp.sum(jnp.where(vbool, jnp.diag(i_logsm), 0.0)) / n_valid
    loss_j = jnp.sum(jnp.where(vbool, jnp.diag(j_logsm), 0.0)) / n_valid
    return -loss_i - loss_j


def rwa_loss(
    im,
    s,
    im_mask,
    s_mask=None,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    block_segment: int = 0,
    compute_dtype=None,
    remat: bool = False,
    valid=None,
):
    """Region-word alignment loss: KL(softmax(lambda*scores) || ~identity)
    (reference model/loss.py:105-116).

    im: (B, R, D) local region embeds; s: (B, W, D) local word embeds;
    im_mask/s_mask: additive masks (0 / -100). `block_segment` > 0 computes
    the score matrix in differentiable scan blocks — bounds the (B, B, W, D)
    cross-attention intermediates for large global batches (framework
    extension; the reference always materializes the full tensor).
    `valid`: optional (B,) 0/1 sample-validity mask (see norm_softmax_loss) —
    the result equals the loss over the valid rows/cols alone.
    """
    if block_segment and im.shape[0] > block_segment and im.shape[0] % block_segment == 0:
        from demovlp_tpu.ops.xattn import xattn_score_blockwise

        if s_mask is None:
            s_mask = jnp.zeros(s.shape[:2], dtype=im.dtype)
        scores = xattn_score_blockwise(
            im, s, im_mask, s_mask,
            segment=block_segment,
            lambda_softmax=lambda_softmax,
            focal_type=focal_type,
            compute_dtype=compute_dtype,
        )
    else:
        score_fn = xattn_score
        if remat:
            # recompute the O(B^2) attention pipeline in the backward pass
            # instead of storing its residuals: pure HBM-traffic trade, zero
            # numerics change (the loss is traffic-bound, BENCH_NOTES.md)
            score_fn = jax.checkpoint(
                xattn_score, static_argnums=(4, 5, 6)
            )
        scores = score_fn(im, s, im_mask, s_mask, lambda_softmax,
                          focal_type, compute_dtype)
    labels = jnp.eye(im.shape[0], dtype=scores.dtype)
    if valid is None:
        pred = jax.nn.softmax(scores * lambda_softmax, axis=1)
        loss = pred * (
            jax.nn.log_softmax(scores * lambda_softmax, axis=1)
            - jnp.log(labels + 1e-6)
        )
        return jnp.mean(jnp.sum(loss, axis=1))
    vbool = valid.astype(bool)
    neg = jnp.where(vbool, 0.0, -jnp.inf).astype(scores.dtype)
    logits = scores * lambda_softmax + neg[None, :]
    pred = jax.nn.softmax(logits, axis=1)  # masked cols -> exactly 0
    ldiff = jax.nn.log_softmax(logits, axis=1) - jnp.log(labels + 1e-6)
    # where BEFORE reading pred*ldiff at masked cols (0 * -inf = NaN)
    loss = jnp.where(vbool[None, :], pred * ldiff, 0.0)
    row_loss = jnp.sum(loss, axis=1)
    return jnp.sum(jnp.where(vbool, row_loss, 0.0)) / jnp.sum(
        valid.astype(scores.dtype)
    )


def cross_entropy_loss(logits, labels):
    """Mean softmax cross-entropy with integer labels
    (reference model/loss.py:180-187, torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def max_margin_ranking_loss(x, margin: float = 1.0, fix_norm: bool = True):
    """Bidirectional max-margin ranking loss over a similarity matrix
    (reference model/loss.py:141-177)."""
    n = x.shape[0]
    diag = jnp.diag(x)
    x1 = jnp.broadcast_to(diag[:, None], (n, n)).reshape(-1)
    x1 = jnp.concatenate([x1, x1], axis=0)
    x2 = jnp.concatenate([x.reshape(-1), x.T.reshape(-1)], axis=0)
    max_margin = jax.nn.relu(margin - (x1 - x2))
    if fix_norm:
        keep = 1.0 - jnp.eye(n)
        keep = jnp.concatenate([keep.reshape(-1), keep.T.reshape(-1)], axis=0)
        # masked mean over the off-diagonal elements (the reference gathers
        # them with index_select; a masked mean is identical and static-shape)
        return jnp.sum(max_margin * keep) / jnp.sum(keep)
    return jnp.mean(max_margin)


@dataclass(frozen=True)
class NormSoftmaxLoss:
    temperature: float = 0.05

    def __call__(self, sim, valid=None):
        return norm_softmax_loss(sim, self.temperature, valid)


@dataclass(frozen=True)
class RWALoss:
    lambda_softmax: float = 20.0
    focal_type: str = "prob"
    margin: float = 0.0  # parity field; unused (reference never uses it)
    max_violation: bool = False  # parity field; unused
    block_segment: int = 0  # framework extension: blockwise score matrix
    # "bfloat16" halves the HBM cost of the O(B^2) training loss (sims/CE
    # stay f32 — see ops/xattn.py); "float32" = exact reference numerics
    local_dtype: str = "float32"
    # recompute-in-backward for the score pipeline (numerics-identical)
    local_remat: bool = False

    def __call__(self, im, s, im_mask, s_lens=None, s_mask=None, valid=None):
        # s_lens accepted for call-surface parity (reference threads text
        # lengths through but never uses them, loss.py:294-330).
        return rwa_loss(im, s, im_mask, s_mask, self.lambda_softmax,
                        self.focal_type, self.block_segment,
                        jnp.dtype(self.local_dtype), self.local_remat, valid)

    def get_sim(self, im, s, im_mask, s_lens=None, s_mask=None):
        return xattn_score(im, s, im_mask, s_mask, self.lambda_softmax, self.focal_type)


@dataclass(frozen=True)
class GlobalLocalLoss:
    """Global InfoNCE + local RWA loss (reference model/loss.py:10-45).

    Note: the reference stores `coef` as self.cof_local but never applies it —
    the total is always global + local (loss.py:41-44). We keep the same
    (documented) behavior for parity.
    """

    temperature: float = 0.05
    lambda_softmax: float = 20.0
    focal_type: str = "prob"
    margin: float = 0.0
    max_violation: bool = False
    use_local: bool = True
    use_global: bool = True
    coef: float = 1000.0
    local_block_segment: int = 0  # framework extension (see rwa_loss)
    local_dtype: str = "float32"  # framework extension (see RWALoss)
    local_remat: bool = False  # framework extension (see RWALoss)
    global_loss: NormSoftmaxLoss = field(init=False)
    local_loss: RWALoss = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "global_loss", NormSoftmaxLoss(self.temperature))
        object.__setattr__(
            self,
            "local_loss",
            RWALoss(self.lambda_softmax, self.focal_type, self.margin,
                    self.max_violation, self.local_block_segment,
                    self.local_dtype, self.local_remat),
        )

    def __call__(self, global_sim, local_im, local_s, local_im_mask,
                 local_s_lens, local_s_mask, valid=None):
        if not self.use_local:
            g = self.global_loss(global_sim, valid)
            return g, g, jnp.zeros((), dtype=global_sim.dtype)
        if not self.use_global:
            l = self.local_loss(local_im, local_s, local_im_mask,
                                local_s_lens, local_s_mask, valid)
            return l, jnp.zeros((), dtype=l.dtype), l
        g = self.global_loss(global_sim, valid)
        l = self.local_loss(local_im, local_s, local_im_mask, local_s_lens,
                            local_s_mask, valid)
        return g + l, g, l


@dataclass(frozen=True)
class CrossEntropy:
    def __call__(self, logits, labels):
        return cross_entropy_loss(logits, labels)


@dataclass(frozen=True)
class MaxMarginRankingLoss:
    margin: float = 1.0
    fix_norm: bool = True

    def __call__(self, x):
        return max_margin_ranking_loss(x, self.margin, self.fix_norm)
