"""FLOPs model + MFU accounting for the graded bench (BASELINE.json's
"TPU speed-of-light" target tracked as an artifact field, not prose).

Two flop sources, cross-checkable against each other:

  * `compiled_step_flops` — XLA's own cost analysis of the compiled train
    step (exact for the HLO actually executed, fwd+bwd+optimizer included).
  * `retrieval_step_flops_model` — an analytic model of the envelope: two
    transformer towers fwd+bwd (bwd = 2x fwd) + the O(B^2) local RWA
    cross-attention (model/loss.py:209-330 semantics as implemented in
    ops/xattn.py). Used as the fallback when a backend's cost analysis is
    unavailable, and as a sanity bound on the XLA count.

MFU = (per-chip flops/s) / (per-chip peak flops at the compute dtype).
Peak numbers are the published per-chip bf16 figures.
"""
from __future__ import annotations

from typing import Optional

# published per-chip peak dense bf16 TFLOP/s by device_kind prefix
# (v5e: 197, v4: 275, v5p: 459, v6e/Trillium: 918)
_PEAK_BF16_TFLOPS = (
    ("TPU v6", 918.0),
    ("TPU v5p", 459.0),
    ("TPU v5e", 197.0),
    ("TPU v5 lite", 197.0),
    ("TPU v5lite", 197.0),
    ("TPU v5", 459.0),
    ("TPU v4", 275.0),
    ("TPU v3", 123.0),
    ("TPU v2", 46.0),
)


def peak_bf16_flops(device) -> Optional[float]:
    """Per-chip peak dense bf16 FLOP/s for a jax device, None if unknown
    (e.g. the CPU test backend)."""
    kind = getattr(device, "device_kind", "") or ""
    for prefix, tflops in _PEAK_BF16_TFLOPS:
        if kind.startswith(prefix):
            return tflops * 1e12
    return None


def compiled_step_flops(jitted, *args, num_partitions: int = 1
                        ) -> Optional[float]:
    """GLOBAL flops of a jitted function at the given example args, from
    XLA's cost analysis. Under SPMD partitioning XLA reports the flops of
    the single per-device program (verified: an 8-way row-sharded matmul
    reports 1/8 of the global count), so the caller passes the mesh's
    device count as num_partitions to recover the global figure. None when
    the backend doesn't report flops."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax: one dict per program
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", -1.0))
        return flops * num_partitions if flops > 0 else None
    except Exception:
        return None


def _transformer_tower_flops(seq: int, d: int, ffn: int, layers: int) -> float:
    """Forward flops of one encoder stack on one sequence (matmul 2*MACs;
    norms/softmax/elementwise omitted — O(1%) at these shapes):
    qkv+out projections 4*seq*d^2, attention 2*seq^2*d (QK^T + AV),
    ffn 2*seq*d*ffn."""
    per_layer = (
        4 * seq * d * d * 2       # q,k,v,out projections
        + 2 * seq * seq * d * 2   # scores + context
        + 2 * seq * d * ffn * 2   # two ffn matmuls
    )
    return float(layers * per_layer)


def retrieval_step_flops_model(
    global_b: int,
    frames: int,
    regions: int,
    text_len: int,
    proj_dim: int = 256,
    obj_depth: int = 12,
    obj_dim: int = 768,
    text_layers: int = 6,
    text_dim: int = 768,
    use_local: bool = True,
) -> float:
    """Analytic GLOBAL flops for one pre-train step at the envelope shapes
    (both towers fwd+bwd + global sims + O(B^2) local RWA loss). bwd = 2x fwd
    for every matmul-dominated piece; the AdamW elementwise update and
    host-side pieces are omitted (sub-1%)."""
    obj_seq = frames * regions + 1
    obj_fwd = _transformer_tower_flops(obj_seq, obj_dim, 4 * obj_dim, obj_depth)
    # input embed: 2054 -> 768 (+ 6-d geometry, negligible) and 768 -> proj
    obj_fwd += frames * regions * 2054 * obj_dim * 2
    obj_fwd += obj_seq * obj_dim * proj_dim * 2
    txt_fwd = _transformer_tower_flops(text_len, text_dim, 4 * text_dim,
                                       text_layers)
    txt_fwd += text_len * text_dim * proj_dim * 2
    towers = 3.0 * global_b * (obj_fwd + txt_fwd)  # fwd + bwd(2x)

    # global sim matrix (B x B x proj) fwd+bwd
    sims = 3.0 * 2 * global_b * global_b * proj_dim

    local = 0.0
    if use_local:
        # RWA cross-attention per (video, text) pair (ops/xattn.py,
        # reference model/loss.py:209-271): scores (L_t x L_r) = 2*Lt*Lr*d,
        # re-attended context = 2*Lt*Lr*d, cosine row similarities ~ 2*Lt*d;
        # computed for BOTH directions (i2t + t2i) over B^2 pairs, fwd+bwd.
        lt, lr = text_len - 1, frames * regions
        per_pair = 2 * (2 * lt * lr * proj_dim * 2 + 2 * lt * proj_dim)
        local = 3.0 * global_b * global_b * per_pair

    return towers + sims + local


def mfu(per_chip_flops_per_sec: float, device) -> Optional[float]:
    peak = peak_bf16_flops(device)
    if not peak:
        return None
    return per_chip_flops_per_sec / peak
