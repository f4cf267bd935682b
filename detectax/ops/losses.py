"""Detection loss library — one canonical, numerically-stable copy.

The reference duplicates these in every model module (six copies of the
stable focal loss — canonical at `FCOS/fcos.py:443-462`; smooth-L1 at
`FCOS/fcos.py:380-391`; -log-IoU at `FCOS/fcos.py:393-441`; plain sigmoid
BCE at `CenterNet/tf_hourglass_net.py:347-349`). Here each exists once, in
fp32 accumulate regardless of input dtype, and is jit/vmap/grad-safe.

The focal formulation is the parity-sensitive kernel (SURVEY.md §2.5.2): the
reference decomposes the stable binary cross-entropy as
``-log σ(x) = log(1+e^{-|x|}) - min(x,0)`` and
``-log(1-σ(x)) = log(1+e^{-|x|}) + max(x,0)`` before focal weighting. We use
the same decomposition (with `log1p` for the log term), which is
algebraically identical to the reference's
``tmp_abs_term + tmp_x_pos - tmp_x_neg`` arrangement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def _stable_bce_terms(logits: jnp.ndarray):
    """Return (-log σ(x), -log(1-σ(x))) computed stably."""
    log1p_term = jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pos_ce = log1p_term - jnp.minimum(logits, 0.0)  # -log sigmoid(x)
    neg_ce = log1p_term + jnp.maximum(logits, 0.0)  # -log(1 - sigmoid(x))
    return pos_ce, neg_ce


def focal_loss(
    labels: jnp.ndarray,
    logits: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sum-reduced sigmoid focal loss, stable formulation.

    Behavior parity with reference `FCOS/fcos.py:443-462` (α=0.25, γ=2,
    sum reduction over all elements). `weights` (broadcastable to
    `logits.shape`) masks padded cells — needed because the TPU build pads
    feature maps to static shapes.
    """
    labels = labels.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    pos_ce, neg_ce = _stable_bce_terms(logits)
    # jax.nn.sigmoid, NOT 1/(1+exp(-x)): the naive form's VJP is
    # 0*inf = NaN once a background logit drifts below ~-88 (exp
    # overflow), which from-scratch training reliably reaches.
    p = jax.nn.sigmoid(logits)
    loss = (
        labels * alpha * jnp.power(1.0 - p, gamma) * pos_ce
        + (1.0 - labels) * (1.0 - alpha) * jnp.power(p, gamma) * neg_ce
    )
    if weights is not None:
        loss = loss * weights
    return jnp.sum(loss)


def sigmoid_bce_loss(
    labels: jnp.ndarray,
    logits: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sum-reduced stable sigmoid cross-entropy.

    Parity with reference `CenterNet/tf_hourglass_net.py:347-349`
    (`tf.nn.sigmoid_cross_entropy_with_logits`, sum-reduced).
    """
    labels = labels.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    pos_ce, neg_ce = _stable_bce_terms(logits)
    loss = labels * pos_ce + (1.0 - labels) * neg_ce
    if weights is not None:
        loss = loss * weights
    return jnp.sum(loss)


def smooth_l1_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    mask: jnp.ndarray | float = 1.0,
    delta: float = 1.0,
) -> jnp.ndarray:
    """Sum-reduced smooth-L1 (Huber-like) with a per-cell mask.

    Parity with reference `FCOS/fcos.py:380-391`: mask broadcasts over the
    last (coordinate) axis; elementwise `0.5 d^2` below `delta`, `|d|` above.
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    diff = jnp.abs(y_true - y_pred)
    loss = jnp.where(diff < delta, 0.5 * diff * diff, diff)
    mask = jnp.asarray(mask, dtype=jnp.float32)
    if mask.ndim > 0:
        mask = mask[..., None]
    return jnp.sum(loss * mask)


def iou_loss(
    ltrb_true: jnp.ndarray,
    ltrb_pred: jnp.ndarray,
    mask: jnp.ndarray,
    grid_offset: float = 0.0,
) -> jnp.ndarray:
    """Sum-reduced -log(IoU) over per-cell (t,b,l,r) stride-unit grids.

    Parity with reference `FCOS/fcos.py:393-441`: both boxes are
    reconstructed around a shared cell-center grid (reference uses integer
    grid positions, hence default ``grid_offset=0.0``), intersection /
    union with 1e-12 epsilons, masked sum of -log IoU.
    Channel layout: (t, b, l, r) = distances to (y_low, y_upp, x_low, x_upp).
    """
    ltrb_true = ltrb_true.astype(jnp.float32)
    ltrb_pred = ltrb_pred.astype(jnp.float32)
    t_t, t_b, t_l, t_r = (ltrb_true[..., i] for i in range(4))
    p_t, p_b, p_l, p_r = (ltrb_pred[..., i] for i in range(4))

    true_h = t_t + t_b
    true_w = t_l + t_r
    pred_h = p_t + p_b
    pred_w = p_l + p_r

    # Around a shared center, intersection extents are min of the distances
    # on each side (grid position cancels out of the reference's min/max).
    inter_h = jnp.maximum(0.0, jnp.minimum(t_t, p_t) + jnp.minimum(t_b, p_b))
    inter_w = jnp.maximum(0.0, jnp.minimum(t_l, p_l) + jnp.minimum(t_r, p_r))
    del grid_offset  # extents are translation-invariant; kept for API parity

    inter = inter_h * inter_w
    union = true_h * true_w + pred_h * pred_w - inter
    iou = inter / (union + EPS)
    return jnp.sum(-jnp.log(iou + EPS) * mask)


def centerness_from_ltrb(ltrb: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """FCOS centerness: sqrt of min/max side-ratio product.

    Parity with reference `FCOS/fcos.py:259-274`: ratio over channels (0,1)
    times ratio over channels (2,3), epsilon-regularized, sqrt.
    """
    a = jnp.minimum(ltrb[..., 0], ltrb[..., 1]) + eps
    b = jnp.maximum(ltrb[..., 0], ltrb[..., 1]) + eps
    c = jnp.minimum(ltrb[..., 2], ltrb[..., 3]) + eps
    d = jnp.maximum(ltrb[..., 2], ltrb[..., 3]) + eps
    return jnp.sqrt((a / b) * (c / d))
