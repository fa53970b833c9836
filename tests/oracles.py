"""Independent numpy oracles for the cross-modal attention math.

Written directly from the math spec (leaky-relu'd similarity, l2norm over
query axis, lambda-softmax over source axis, equal-focal reweighting,
re-normalized re-attention, cosine-to-weighted-context averaged over query
positions) so framework bugs and oracle bugs are unlikely to coincide.
"""
import numpy as np


def np_l2norm(x, axis=-1, eps=1e-8):
    return x / (np.sqrt((x ** 2).sum(axis=axis, keepdims=True)) + eps)


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_func_attention(query, context, query_mask, context_mask,
                      lambda_softmax=20.0, focal_type="prob"):
    Bq, Lq, D = query.shape
    Bc, Ls, _ = context.shape
    q = np_l2norm(query)
    c = np_l2norm(context)
    # attn[bc, bq, ls, lq]
    attn = np.einsum("csd,qld->cqsl", c, q)
    attn = np.where(attn >= 0, attn, 0.1 * attn)  # leaky relu slope .1
    attn = np_l2norm(attn, axis=-1)  # over lq
    attn = attn.transpose(0, 1, 3, 2)  # (bc, bq, lq, ls)
    attn = attn + query_mask[None, :, :, None] + context_mask[:, None, None, :]
    attn = np_softmax(attn * lambda_softmax, axis=-1)
    if focal_type == "equal":
        funcF = attn * Ls - attn.sum(-1, keepdims=True)
        H = (funcF > 0).astype(attn.dtype)
    else:
        H = 1.0
    tmp = H * attn
    re_attn = tmp / tmp.sum(-1, keepdims=True)
    return np.einsum("cqls,csd->cqld", re_attn, c)


def np_cos(a, b, eps=1e-8):
    w12 = (a * b).sum(-1)
    n = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return w12 / np.maximum(n, eps)


def np_xattn_score(images, captions, img_mask, cap_mask,
                   lambda_softmax=20.0, focal_type="prob"):
    w = np_func_attention(captions, images, cap_mask, img_mask,
                          lambda_softmax, focal_type)
    i2t = np_cos(captions[None], w).mean(-1)  # (Ni, Nc)
    w = np_func_attention(images, captions, img_mask, cap_mask,
                          lambda_softmax, focal_type)
    t2i = np_cos(images[None], w).mean(-1)  # (Nc, Ni)
    return t2i.T + i2t
