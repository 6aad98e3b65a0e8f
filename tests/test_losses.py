"""Loss functions vs manual computations (reference graphgps/loss/* semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from graphgps_tpu.models.losses import (binary_cross_entropy, cross_entropy,
                                        l1_loss, multilabel_cross_entropy,
                                        mse_loss, subtoken_cross_entropy,
                                        weighted_cross_entropy)


def test_l1_masked():
    pred = jnp.array([[1.0], [2.0], [99.0]])
    true = jnp.array([[0.0], [4.0], [0.0]])
    mask = jnp.array([True, True, False])
    assert float(l1_loss(pred, true, mask)) == pytest.approx((1 + 2) / 2)


def test_mse_masked():
    pred = jnp.array([[1.0], [3.0]])
    true = jnp.array([[0.0], [1.0]])
    mask = jnp.array([True, True])
    assert float(mse_loss(pred, true, mask)) == pytest.approx((1 + 4) / 2)


def test_cross_entropy_manual():
    pred = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    true = jnp.array([0, 1])
    mask = jnp.array([True, True])
    expect = -np.log(np.exp(2) / (np.exp(2) + 1))
    assert float(cross_entropy(pred, true, mask)) == pytest.approx(expect, rel=1e-4)


def test_bce_matches_formula():
    logits = jnp.array([0.5, -1.0, 2.0])
    t = jnp.array([1.0, 0.0, 1.0])
    mask = jnp.array([True, True, True])
    p = 1 / (1 + np.exp(-np.array(logits)))
    expect = -(np.array(t) * np.log(p) + (1 - np.array(t)) * np.log(1 - p)).mean()
    assert float(binary_cross_entropy(logits, t, mask)) == pytest.approx(expect, rel=1e-5)


def test_multilabel_nan_filtering():
    """NaN targets are excluded (reference multilabel_classification_loss.py:6-16)."""
    pred = jnp.array([[0.0, 5.0], [0.0, -5.0]])
    true = jnp.array([[1.0, np.nan], [np.nan, np.nan]])
    mask = jnp.array([True, True])
    expect = np.log(2)  # only (0,0) valid: BCE(logit 0, target 1) = log 2
    assert float(multilabel_cross_entropy(pred, true, mask)) == pytest.approx(
        expect, rel=1e-5)


def test_weighted_ce_upweights_rare():
    pred = jnp.array([[0.0, 0.0]] * 4)
    true = jnp.array([0, 0, 0, 1])
    mask = jnp.array([True] * 4)
    loss_w = float(weighted_cross_entropy(pred, true, mask))
    loss_u = float(cross_entropy(pred, true, mask))
    # uniform logits → both log 2 regardless of weights
    assert loss_w == pytest.approx(np.log(2), rel=1e-5)
    assert loss_u == pytest.approx(np.log(2), rel=1e-5)
    # now with a confident wrong prediction on the rare class the weighted loss
    # must exceed the unweighted loss
    pred2 = jnp.array([[5.0, 0.0]] * 4)
    assert float(weighted_cross_entropy(pred2, true, mask)) > \
        float(cross_entropy(pred2, true, mask))


def test_subtoken_ce_shape():
    B, S, V = 2, 5, 7
    pred = jnp.zeros((B, S, V))
    true = jnp.zeros((B, S), dtype=jnp.int32)
    mask = jnp.array([True, False])
    assert float(subtoken_cross_entropy(pred, true, mask)) == pytest.approx(
        np.log(V), rel=1e-5)
