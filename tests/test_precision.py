"""bf16 mixed-precision policy (cfg.mixed_precision) + BN-under-accumulation.

Reference analog: tf32 matmul policy (/root/reference/main.py:30-31); here a
full bf16 storage/compute policy with f32 master params (train/precision.py).
Also pins the sequential-BN semantics under gradient accumulation (reference
custom_train.py:33-39 updates running stats every micro-batch).
"""
import jax
import jax.numpy as jnp
import numpy as np

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.optim.optimizers import make_tx
from graphgps_tpu.train.loop import init_state, make_steps
from graphgps_tpu.train.precision import apply_policy, cast_batch, cast_floating

from test_models import small_cfg


def _setup(mixed: bool, **over):
    cfg = small_cfg(**over)
    cfg.mixed_precision = mixed
    cfg.optim.clip_grad_norm = True
    ds = load_dataset(cfg)
    batches = [collate(ds.train[i:i + 4], 4, 16, 256,
                       y_graph_level=True).to_graph_batch()
               for i in range(0, 16, 4)]
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = init_state(cfg, model, batches[0], seed=0, tx=tx)
    steps = make_steps(cfg, model, tx)
    return cfg, model, state, steps, batches


def test_cast_floating_skips_ints():
    tree = {"w": jnp.ones((3,), jnp.float32), "i": jnp.ones((3,), jnp.int32)}
    out = cast_floating(tree)
    assert out["w"].dtype == jnp.bfloat16 and out["i"].dtype == jnp.int32


def test_cast_batch_preserves_labels_and_masks():
    cfg = small_cfg()
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256, y_graph_level=True).to_graph_batch()
    gb = gb.replace(extras={**gb.extras,
                            "edge_label": jnp.zeros((4, 3), jnp.float32),
                            "attn_bias": jnp.zeros((4, 2, 16, 16))})
    c = cast_batch(gb)
    assert c.y.dtype == gb.y.dtype                       # targets untouched
    assert c.extras["edge_label"].dtype == jnp.float32   # label extras kept
    assert c.extras["attn_bias"].dtype == jnp.bfloat16   # feature extras cast
    assert c.node_mask.dtype == jnp.bool_


def test_network_stays_bf16_end_to_end():
    """No silent f32 promotion leaks: with bf16 params+features the GPS
    forward (BatchNorm included) emits bf16 predictions."""
    cfg, model, state, _steps, batches = _setup(False)
    params_c, batch_c = apply_policy(state.params, batches[0], True)
    pred, _ = model.apply({"params": params_c,
                           "batch_stats": state.batch_stats},
                          batch_c, False, mutable=False)
    assert pred.dtype == jnp.bfloat16


def test_master_params_stay_f32_and_loss_matches():
    """Params/opt state stay f32 under the policy, and the short-horizon loss
    trajectory matches the f32 run within bf16 tolerance."""
    losses = {}
    for mixed in (False, True):
        cfg, model, state, (train_step, _, _, eval_step), batches = \
            _setup(mixed)
        rng = jax.random.PRNGKey(0)
        traj = []
        for ep in range(6):
            for b in batches:
                rng, sub = jax.random.split(rng)
                state, loss, *_ = train_step(state, b, sub)
                traj.append(float(loss))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        losses[mixed] = np.asarray(traj)
    assert np.isfinite(losses[True]).all()
    # same starting loss (init is identical), similar descent
    np.testing.assert_allclose(losses[True][0], losses[False][0],
                               rtol=0.05)
    assert abs(losses[True][-4:].mean() - losses[False][-4:].mean()) < 0.25


def test_layernorm_model_bf16():
    cfg, model, state, _steps, batches = _setup(
        False, **{"gt.layer_norm": True, "gt.batch_norm": False})
    params_c, batch_c = apply_policy(state.params, batches[0], True)
    pred, _ = model.apply({"params": params_c,
                           "batch_stats": state.batch_stats},
                          batch_c, False, mutable=False)
    assert pred.dtype == jnp.bfloat16


def test_bn_accumulation_sequential_semantics():
    """accum=k: each micro-batch consumes the previous micro-batch's mutated
    running stats, so final stats equal a sequential k-forward chain."""
    cfg, model, state, (train_step, grad_step, apply_step, _), batches = \
        _setup(False)
    rng = jax.random.PRNGKey(1)
    subs = [jax.random.fold_in(rng, i) for i in range(4)]

    # sequential reference: k forwards threading batch_stats, no param update
    def fwd(bs_in, b, sub):
        variables = {"params": state.params, "batch_stats": bs_in}
        _, mut = model.apply(variables, b, True, jnp.asarray(0),
                             rngs={"dropout": sub,
                                   "signflip": jax.random.fold_in(sub, 1)},
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    bs_seq = state.batch_stats
    for b, sub in zip(batches, subs):
        bs_seq = fwd(bs_seq, b, sub)
    bs_seq = jax.device_get(bs_seq)

    # accumulated path (apply_step donates `state` — run it last)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    bs = state.batch_stats
    grads = zero
    for b, sub in zip(batches, subs):
        grads, bs, *_ = grad_step(state, bs, b, sub, grads)
    accum_state = apply_step(state, grads, bs, 4)

    flat_a = jax.tree_util.tree_leaves(accum_state.batch_stats)
    flat_s = jax.tree_util.tree_leaves(bs_seq)
    assert flat_a and len(flat_a) == len(flat_s)
    for a, s in zip(flat_a, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                                   rtol=1e-5, atol=1e-6)
