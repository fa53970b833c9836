"""Cross-framework optimizer parity: the reference's ACTUAL optimizer.

The reference builds its optimizer from the transformers module
(`train_dist_multi.py:64`, `configs/pt/o2t-cl-local-select-loss-cc.json:86-87`
selects `AdamW`), with requirements.txt pinning transformers==4.10.0. That
legacy AdamW applies bias correction as a STEP-SIZE factor over an
UNcorrected denominator (`sqrt(v) + eps`, then `lr*sqrt(1-b2^t)/(1-b1^t)`),
and applies weight decay to the POST-step parameter at raw lr — whereas
optax.adamw corrects inside the root (`sqrt(v_hat) + eps`) and decays the
pre-step parameter. The effective eps differs by `1/sqrt(1-b2^t)` — ~32x at
step 1 with eps=1e-6 and b2=0.999.

transformers 4.57 (this environment) has REMOVED AdamW, so the oracle here
is a line-faithful torch reimplementation of transformers 4.10's
`optimization.AdamW.step` (the exact math is reproduced in
`_TorchReferenceAdamW` below, cross-checkable against the pinned version's
published source). Tests:

  * `make_optimizer(reference_exact=True)` matches the torch oracle
    step-for-step (incl. weight decay's sequential semantics).
  * the default optax.adamw path DIVERGES from the oracle at early steps by
    the predicted eps-placement gap — the measured deviation documented in
    PARITY.md #17.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from demovlp_tpu.train.optim import make_optimizer


class _TorchReferenceAdamW(torch.optim.Optimizer):
    """transformers==4.10.0 optimization.AdamW.step, verbatim math."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-6,
                 weight_decay=0.0, correct_bias=True):
        defaults = dict(lr=lr, betas=betas, eps=eps,
                        weight_decay=weight_decay, correct_bias=correct_bias)
        super().__init__(params, defaults)

    @torch.no_grad()
    def step(self):
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad
                state = self.state[p]
                if len(state) == 0:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p)
                    state["exp_avg_sq"] = torch.zeros_like(p)
                exp_avg, exp_avg_sq = state["exp_avg"], state["exp_avg_sq"]
                beta1, beta2 = group["betas"]
                state["step"] += 1
                exp_avg.mul_(beta1).add_(grad, alpha=1.0 - beta1)
                exp_avg_sq.mul_(beta2).addcmul_(grad, grad, value=1.0 - beta2)
                denom = exp_avg_sq.sqrt().add_(group["eps"])
                step_size = group["lr"]
                if group["correct_bias"]:
                    bias_correction1 = 1.0 - beta1 ** state["step"]
                    bias_correction2 = 1.0 - beta2 ** state["step"]
                    step_size = (
                        step_size * (bias_correction2 ** 0.5) / bias_correction1
                    )
                p.addcdiv_(exp_avg, denom, value=-step_size)
                # decoupled decay on the POST-step parameter, raw lr
                if group["weight_decay"] > 0.0:
                    p.add_(p, alpha=-group["lr"] * group["weight_decay"])


def _run_torch(params0, grads, lr, weight_decay):
    tp = [torch.tensor(p, dtype=torch.float32, requires_grad=False)
          for p in params0]
    for t in tp:
        t.grad = torch.zeros_like(t)
    opt = _TorchReferenceAdamW(tp, lr=lr, weight_decay=weight_decay)
    traj = []
    for g_step in grads:
        for t, g in zip(tp, g_step):
            t.grad.copy_(torch.tensor(g, dtype=torch.float32))
        opt.step()
        traj.append([t.detach().numpy().copy() for t in tp])
    return traj


def _run_ours(params0, grads, lr, weight_decay, reference_exact):
    tx = make_optimizer(lr=lr, weight_decay=weight_decay,
                        reference_exact=reference_exact)
    params = [jnp.asarray(p) for p in params0]
    opt_state = tx.init(params)
    traj = []
    for g_step in grads:
        g = [jnp.asarray(x) for x in g_step]
        updates, opt_state = tx.update(g, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        traj.append([np.asarray(p) for p in params])
    return traj


def _fixture(seed=0, n_steps=12):
    rng = np.random.RandomState(seed)
    # mixed scales incl. tiny-gradient entries (where eps placement bites)
    params0 = [
        rng.randn(7, 5).astype(np.float32),
        rng.randn(11).astype(np.float32) * 0.01,
    ]
    grads = [
        [rng.randn(*p.shape).astype(np.float32) * s
         for p, s in zip(params0, (1.0, 1e-4))]
        for _ in range(n_steps)
    ]
    return params0, grads


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_reference_exact_matches_transformers_adamw(weight_decay):
    params0, grads = _fixture()
    lr = 1e-3
    ref = _run_torch(params0, grads, lr, weight_decay)
    ours = _run_ours(params0, grads, lr, weight_decay, reference_exact=True)
    for step, (r_step, o_step) in enumerate(zip(ref, ours)):
        for r, o in zip(r_step, o_step):
            np.testing.assert_allclose(
                o, r, rtol=1e-5, atol=1e-7,
                err_msg=f"step {step + 1} (weight_decay={weight_decay})",
            )


def test_default_optax_adamw_deviates_as_predicted():
    """The PARITY.md #17 measurement: optax.adamw's first-step update uses
    effective eps `eps/sqrt(1-b2)` ~ 32x larger than transformers' — on a
    step-1 update with |g| >> eps both give ~lr*sign(g), but the denominators
    differ enough that the per-entry update gap is orders of magnitude above
    float noise."""
    params0, grads = _fixture(n_steps=1)
    lr = 1e-3
    ref = _run_torch(params0, grads, lr, weight_decay=0.0)
    ours_default = _run_ours(params0, grads, lr, 0.0, reference_exact=False)
    ours_exact = _run_ours(params0, grads, lr, 0.0, reference_exact=True)

    # step 1, b2=0.999: transformers' denom = sqrt((1-b2) g^2) + eps
    #                  = |g|*sqrt(1e-3) + 1e-6;
    # optax's          = |g| + 1e-6 with step factor absorbing sqrt(1e-3).
    # identical with eps=0; with eps=1e-6 the tiny-grad leaf (|g|~1e-4)
    # shifts measurably:
    g = grads[0][1]
    upd_ref = (ref[0][1] - params0[1]) / lr
    upd_def = (ours_default[0][1] - params0[1]) / lr
    # the predicted closed forms, entrywise
    m = 0.1 * g  # (1-b1) g
    v = 1e-3 * g * g
    pred_ref = -np.sqrt(1e-3) / 0.1 * m / (np.sqrt(v) + 1e-6)
    pred_def = -(m / 0.1) / (np.sqrt(v / 1e-3) + 1e-6)
    np.testing.assert_allclose(upd_ref, pred_ref, rtol=1e-4)
    np.testing.assert_allclose(upd_def, pred_def, rtol=1e-4)
    gap = np.abs(upd_ref - upd_def).max()
    assert gap > 1e-3, gap  # far above float32 noise on a ~1e0-scale update
    # and reference_exact closes it
    gap_exact = np.abs(ours_exact[0][1] - ref[0][1]).max()
    assert gap_exact < 1e-7, gap_exact
