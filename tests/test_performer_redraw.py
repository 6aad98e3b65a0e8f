"""Performer FAVOR+ projection redraw: step-deterministic, redrawn every
``redraw_interval`` steps (the reference's ProjectionUpdater behavior class,
performer_layer.py:323-352, as explicit PRNG state)."""
import jax
import jax.numpy as jnp
import numpy as np

from graphgps_tpu.ops import favor


def test_redraw_interval_semantics():
    key = jax.random.PRNGKey(0)
    m, d = 16, 8

    def proj(step):
        return np.asarray(favor.draw_projection(
            key, jnp.asarray(step), 100, m, d))

    # same interval bucket → identical projection
    np.testing.assert_array_equal(proj(0), proj(99))
    np.testing.assert_array_equal(proj(100), proj(150))
    # new bucket → fresh projection
    assert (proj(0) != proj(100)).any()
    # eval mode (step None) is deterministic
    p_eval = np.asarray(favor.draw_projection(key, None, 100, m, d))
    np.testing.assert_array_equal(
        p_eval, np.asarray(favor.draw_projection(key, None, 100, m, d)))


def test_projection_orthogonal_blocks():
    proj = np.asarray(favor.orthogonal_gaussian(jax.random.PRNGKey(1), 8, 8))
    # rows of one block are orthogonal before norm-rescaling: check pairwise
    # angles after re-normalizing rows
    q = proj / np.linalg.norm(proj, axis=1, keepdims=True)
    gram = q @ q.T
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-5)
