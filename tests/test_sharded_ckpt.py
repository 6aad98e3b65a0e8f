"""Sharded checkpoint/resume (SURVEY.md §5 checkpoint at scale; roadmap #5).

Two layers of validation:

1. In-process: a tensor-parallel state on a (2 data × 4 model) simulated mesh
   round-trips through save_ckpt/load_ckpt — the sharded IO path kicks in
   automatically (`_needs_sharded_io`), arrays restore onto the SAME
   NamedShardings, values are bit-identical, scheduler sidecar survives.
2. Cross-process: two real OS processes under jax.distributed each own one
   CPU device; the parameter array is sharded across BOTH processes (neither
   can device_get it whole). Each process writes only its own shard on save
   and reads only its own shard on restore.
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.driver import infer_dims
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.optim.optimizers import make_tx
from graphgps_tpu.parallel.tensor import shard_params_tp


def _tp_state():
    cfg = new_cfg()
    cfg.parallel.model_axis = 4
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = 8
    cfg.gt.layers = 2
    cfg.gt.dim_hidden = 32
    cfg.gt.n_heads = 4
    cfg.gt.batch_norm = False
    cfg.gt.layer_norm = True
    ds = load_dataset(cfg)
    dim_out = infer_dims(cfg, ds)
    gb = collate(ds.train[:8], 8, 16, 512).to_graph_batch()
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    return shard_params_tp(state, mesh), mesh


def _model_sharded_leaves(params):
    out = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if isinstance(leaf, jax.Array) and "model" in str(leaf.sharding.spec):
            out.append(("/".join(str(getattr(k, "key", k)) for k in kp), leaf))
    return out


def test_tp_state_triggers_sharded_io():
    state, _ = _tp_state()
    assert _model_sharded_leaves(state.params), "setup must TP-shard something"
    assert L._needs_sharded_io(state)


def test_replicated_state_keeps_host_path():
    state, mesh = _tp_state()
    rep = NamedSharding(mesh, P())
    flat = jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.device_get(x), rep)
        if isinstance(x, jax.Array) else x, state)
    assert not L._needs_sharded_io(flat)


def test_sharded_ckpt_roundtrip(tmp_path):
    state, mesh = _tp_state()
    run_dir = str(tmp_path)
    L.save_ckpt(run_dir, state, 3, {"lr": 0.01, "best": 1.5}, async_save=True)
    L.wait_for_ckpts()

    # fresh state with the same shardings but zeroed values
    zeroed = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x) if isinstance(x, jax.Array) else x, state)
    restored, nxt, sched = L.load_ckpt(run_dir, zeroed)

    assert nxt == 4
    assert sched == {"lr": 0.01, "best": 1.5}
    # values bit-identical to what was saved
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(restored.params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # arrays restored DIRECTLY onto the live mesh layout, not replicated
    orig = dict(_model_sharded_leaves(state.params))
    back = dict(_model_sharded_leaves(restored.params))
    assert orig.keys() == back.keys() and orig
    for k in orig:
        assert back[k].sharding == orig[k].sharding
    # opt_state moments came back too (adam mu for one sharded kernel)
    on = jax.tree_util.tree_leaves(state.opt_state)
    bn = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(on) == len(bn)
    for a, b in zip(on, bn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_ckpt_resume_after_step(tmp_path):
    """Save → keep training → crash → resume restores the saved epoch."""
    state, mesh = _tp_state()
    run_dir = str(tmp_path)
    L.save_ckpt(run_dir, state, 0, {}, async_save=False)
    L.save_ckpt(run_dir, state, 5, {"num_bad": 2}, async_save=True)
    L.wait_for_ckpts()
    zeroed = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x) if isinstance(x, jax.Array) else x, state)
    _, nxt, sched = L.load_ckpt(run_dir, zeroed)          # latest
    assert nxt == 6 and sched == {"num_bad": 2}
    _, nxt0, _ = L.load_ckpt(run_dir, zeroed, epoch=0)    # explicit epoch
    assert nxt0 == 1
    L.clean_ckpt(run_dir, 5)
    eps = sorted(x for x in os.listdir(L.ckpt_dir(run_dir)) if x.isdigit())
    assert eps == ["5"]


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from graphgps_tpu.parallel.mesh import init_multihost
import graphgps_tpu.train.loop as L

coord, pid, run_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
init_multihost(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2

mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
sh = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

def make_state(fill):
    # w is sharded ACROSS the two processes: local shard = rows of this pid
    local = np.full((2, 8), fill * (pid + 1), np.float32)
    w = jax.make_array_from_process_local_data(sh, local, (4, 8))
    assert not w.is_fully_addressable
    mu = jax.make_array_from_process_local_data(sh, local * 0.5, (4, 8))
    bs = jax.device_put(np.arange(3, dtype=np.float32) * fill, rep)
    return L.TrainState(params={"w": w}, batch_stats={"m": bs},
                        opt_state=(mu,), step=0)

state = make_state(1.0)
assert L._needs_sharded_io(state)
L.save_ckpt(run_dir, state, 2, {"lr": 0.5}, async_save=True)
L.wait_for_ckpts()

blank = make_state(0.0)
restored, nxt, sched = L.load_ckpt(run_dir, blank)
assert nxt == 3, nxt
assert sched == {"lr": 0.5}, sched
w = restored.params["w"]
assert w.sharding.spec == sh.spec and not w.is_fully_addressable
# this process's shard holds ITS saved rows
got = np.asarray(w.addressable_shards[0].data)
np.testing.assert_array_equal(got, np.full((2, 8), float(pid + 1)))
mu = np.asarray(restored.opt_state[0].addressable_shards[0].data)
np.testing.assert_array_equal(mu, np.full((2, 8), 0.5 * (pid + 1)))
np.testing.assert_array_equal(np.asarray(restored.batch_stats["m"]),
                              np.arange(3, dtype=np.float32))
print("OK", pid)
"""


def test_two_process_sharded_ckpt(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out
