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


def test_local_window_heads_match_dense_when_window_covers_graph(rng):
    """With local_window >= N every node pair shares bucket 0, so all-local
    Performer attention IS dense masked attention — i.e. the GPSLayer
    Performer branch with local_heads=H must equal the Transformer branch
    with the same parameters (reference LocalAttention semantics,
    performer_layer.py:455-459)."""
    import jax
    import jax.numpy as jnp

    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import collate
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.gps_layer import GPSLayer

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 8
    cfg.dataset.synth_max_nodes = 10
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 12, 128, y_graph_level=True).to_graph_batch()
    x = jnp.asarray(rng.normal(size=(gb.num_node_slots, 16)).astype(np.float32))

    def make(gtype, local_heads=0):
        return GPSLayer(dim_h=16, local_gnn_type="None",
                        global_model_type=gtype, num_heads=2,
                        performer_local_heads=local_heads,
                        performer_local_window=64,
                        batch_norm=False, layer_norm=True)

    perf = make("Performer", local_heads=2)
    variables = perf.init({"params": jax.random.PRNGKey(0)}, gb, x, None,
                          False)
    out_local, _ = perf.apply(variables, gb, x, None, False)
    # same params through the Transformer branch (identical module layout)
    out_dense, _ = make("Transformer").apply(variables, gb, x, None, False)
    np.testing.assert_allclose(np.asarray(out_local), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-6)

    # mixed global/local heads: runs and differs from pure FAVOR+
    out_mixed, _ = make("Performer", local_heads=1).apply(
        variables, gb, x, None, False)
    out_favor, _ = make("Performer", local_heads=0).apply(
        variables, gb, x, None, False)
    assert np.isfinite(np.asarray(out_mixed)).all()
    assert not np.allclose(np.asarray(out_local), np.asarray(out_favor),
                           atol=1e-4)


def test_local_window_bucketing_limits_attention(rng):
    """With a small window, a query must NOT attend beyond +-1 bucket: move a
    distant node's value and the early outputs stay fixed."""
    import jax
    import jax.numpy as jnp

    from graphgps_tpu.ops.mha import mha_core

    B, H, N, Dh = 1, 1, 12, 4
    w = 2  # buckets {0,1},{2,3},... query 0 sees keys 0..3 only
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    bucket = jnp.arange(N) // w
    band = jnp.abs(bucket[:, None] - bucket[None, :]) <= 1
    bias = jnp.where(band, 0.0, -1e30)[None, None]
    out1 = np.asarray(mha_core(q, k, v, mask, bias=bias))
    v2 = v.at[0, 0, 10].set(99.0)  # far key, bucket 5
    out2 = np.asarray(mha_core(q, k, v2, mask, bias=bias))
    np.testing.assert_allclose(out1[0, 0, :4], out2[0, 0, :4], rtol=1e-6)
    assert not np.allclose(out1[0, 0, 10], out2[0, 0, 10])
