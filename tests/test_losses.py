import jax
import jax.numpy as jnp
import numpy as np

from detectax.ops import losses as L


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _reference_focal(labels, logits, alpha=0.25, gamma=2.0):
    """Literal numpy transcription of the reference's stable focal loss
    (FCOS/fcos.py:443-462) used as a parity oracle."""
    labels = labels.astype(np.float64)
    logits = logits.astype(np.float64)
    log_term = np.log(1.0 + np.exp(-np.abs(logits)))
    p = _sigmoid(logits)
    abs_term = labels * alpha * log_term * (1 - p) ** gamma + (
        p**gamma
    ) * (1 - labels) * (1 - alpha) * log_term
    x_neg = labels * alpha * np.minimum(logits, 0) * (1 - p) ** gamma
    x_pos = (1 - labels) * (1 - alpha) * np.maximum(logits, 0) * p**gamma
    return np.sum(abs_term + x_pos - x_neg)


def test_focal_loss_parity_with_reference_formula(rng):
    logits = rng.normal(scale=5.0, size=(16, 16, 8)).astype(np.float32)
    labels = (rng.uniform(size=(16, 16, 8)) < 0.1).astype(np.float32)
    got = float(L.focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
    want = _reference_focal(labels, logits)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_stable_at_extreme_logits():
    logits = jnp.asarray([-80.0, 80.0, -200.0, 200.0])
    labels = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    val = float(L.focal_loss(labels, logits))
    assert np.isfinite(val)
    # extreme wrong-way logits should give ~|logit|-scale loss, not inf/nan
    assert val > 10.0


def test_focal_loss_grad_finite(rng):
    logits = jnp.asarray(rng.normal(scale=30.0, size=(64,)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(64,)) < 0.5).astype(np.float32))
    g = jax.grad(lambda x: L.focal_loss(labels, x))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_focal_loss_grad_finite_past_exp_overflow():
    """Regression: 1/(1+exp(-x)) has a 0*inf=NaN VJP below x~-88, which
    from-scratch training reaches (background logits drift unboundedly
    negative). The stable jax.nn.sigmoid path must stay finite."""
    logits = jnp.asarray([-100.0, -500.0, 100.0, 500.0, 0.0])
    labels = jnp.asarray([0.0, 1.0, 1.0, 0.0, 1.0])
    g = jax.grad(lambda x: L.focal_loss(labels, x))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fcos_centerness_grad_finite_past_exp_overflow():
    from detectax.train.losses import fcos_loss

    yt = [jnp.zeros((1, 4, 4, 8))]

    def f(logit):
        yp = [jnp.full((1, 4, 4, 8), logit)]
        return fcos_loss(yt, yp)["cen"]

    g = float(jax.grad(f)(jnp.asarray(-120.0)))
    assert np.isfinite(g)


def test_smooth_l1_matches_reference_formula(rng):
    y_true = rng.normal(size=(8, 8, 4)).astype(np.float32)
    y_pred = rng.normal(size=(8, 8, 4)).astype(np.float32)
    mask = (rng.uniform(size=(8, 8)) < 0.5).astype(np.float32)
    got = float(
        L.smooth_l1_loss(jnp.asarray(y_true), jnp.asarray(y_pred), jnp.asarray(mask))
    )
    d = np.abs(y_true - y_pred)
    want = np.sum(np.where(d < 1.0, 0.5 * d * d, d) * mask[..., None])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_loss_perfect_prediction_is_zero():
    ltrb = jnp.asarray(np.random.default_rng(1).uniform(0.5, 4.0, size=(8, 8, 4)))
    mask = jnp.ones((8, 8))
    val = float(L.iou_loss(ltrb, ltrb, mask))
    # -log(iou ~= 1) summed over 64 cells: tiny positive from the epsilons
    assert abs(val) < 1e-3


def test_iou_loss_worse_for_worse_boxes():
    rng = np.random.default_rng(2)
    ltrb = jnp.asarray(rng.uniform(1.0, 4.0, size=(8, 8, 4)).astype(np.float32))
    mask = jnp.ones((8, 8))
    near = float(L.iou_loss(ltrb, ltrb * 1.1, mask))
    far = float(L.iou_loss(ltrb, ltrb * 2.0, mask))
    assert 0 < near < far


def test_sigmoid_bce_matches_standard(rng):
    logits = rng.normal(size=(32,)).astype(np.float32)
    labels = (rng.uniform(size=(32,)) < 0.5).astype(np.float32)
    got = float(L.sigmoid_bce_loss(jnp.asarray(labels), jnp.asarray(logits)))
    p = _sigmoid(logits.astype(np.float64))
    want = -np.sum(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_centerness_formula():
    ltrb = jnp.asarray([[[1.0, 1.0, 1.0, 1.0], [1.0, 4.0, 2.0, 2.0]]])
    cen = np.asarray(L.centerness_from_ltrb(ltrb))
    np.testing.assert_allclose(cen[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(cen[0, 1], np.sqrt(0.25), atol=1e-4)
