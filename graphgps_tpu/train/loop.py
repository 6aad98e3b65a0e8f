"""Training / inference loops.

Capability parity with /root/reference/graphgps/train/custom_train.py:16-260:
the 'custom' epoch loop (train_epoch with grad accumulation + clipping, periodic
eval on val+test, per-epoch scheduler step, periodic / best-on-val checkpointing,
best-so-far reporting) and 'inference-only'. TPU-native differences:

- ONE jitted train step (forward+backward+apply, donated state) per static batch
  shape; batches are fixed-shape so each split compiles exactly once;
- gradient accumulation folds k fixed-shape micro-batches with a jitted
  grad-accumulate step + a jitted apply step (reference custom_train.py:33-39);
- the LR schedule is host-computed per epoch and injected into the optax
  hyperparams (reference steps torch schedulers per epoch, custom_train.py:135-138);
- checkpoints are orbax PyTree saves of {params, batch_stats, opt_state, epoch}.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import shutil
import signal
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..config.config import resolve_metric_best
from ..data.batching import BatchLoader
from ..data.graph import GraphBatch
from ..logging_utils import SplitLogger, create_loggers
from ..models.losses import compute_loss
from ..models.networks import build_model
from ..optim.optimizers import (ReduceLROnPlateau, build_schedule, is_flat_tx,
                                make_tx, set_lr)
from ..registry import register_train

log = logging.getLogger("graphgps_tpu")


def run_key(cfg, seed: int) -> jax.Array:
    """Typed PRNG key with the run's configured implementation.

    ``cfg.train.rng_impl='rbg'`` (default) generates random bits with the
    TPU hardware generator — the pure-threefry bit chains otherwise get
    rematerialized into the attention backward as ~16 µs VPU fusions and
    dominate dropout-heavy tiny-graph steps (docs/RESULTS.md). The impl
    rides the key (jax typed keys), so downstream fold_in/split/make_rng
    need no global configuration.

    Caveat: rbg bit streams are not vmap-invariant — seed-parallel training
    (train/multiseed.py) draws different (equally valid) dropout masks than
    the same seeds run sequentially. Set ``train.rng_impl: threefry`` where
    bitwise seed-parallel/sequential parity matters.
    """
    impl = cfg.train.get("rng_impl", "rbg") if cfg is not None else "rbg"
    if impl == "threefry":  # accept the short spelling
        impl = "threefry2x32"
    return jax.random.key(seed, impl=impl)


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any = 0  # jnp scalar — data field so incrementing never recompiles


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "batch_stats", "opt_state", "step"],
    meta_fields=[])


def _loss_mask(cfg, batch: GraphBatch, pred: jax.Array) -> jax.Array:
    """Pick the padding mask matching the prediction granularity."""
    if pred.shape[0] == batch.num_graphs:
        return batch.graph_mask
    if pred.shape[0] == batch.num_node_slots:
        sm = batch.extras.get("split_mask")
        if sm is not None:
            # transductive node task: one shared graph, per-split node masks
            # (reference GraphGym train/val/test_mask semantics)
            return batch.node_mask & sm.reshape(-1).astype(bool)
        return batch.node_mask
    # edge-level heads carry their own validity in extras
    m = batch.extras.get("edge_label_mask")
    if m is not None:
        return m.reshape(-1)
    return jnp.ones((pred.shape[0],), dtype=bool)


def _build_raw_steps(cfg, model, tx, flat: Optional[bool] = None):
    """Un-jitted step functions (shared by make_steps and make_fused_steps).

    ``flat`` (defaults to whether ``tx`` is flat_ravel-wrapped, detected via
    is_flat_tx): apply the parameter update in the raveled domain — one flat
    add + one unravel instead of ~150 per-leaf update slices + ~150 per-leaf
    adds. Bitwise-identical values, fewer kernels on op-count-bound steps."""
    from jax.flatten_util import ravel_pytree

    from .precision import apply_policy

    if flat is None:
        flat = is_flat_tx(tx)
    mp = bool(cfg.get("mixed_precision", False))

    def tx_apply(grads, opt_state, params):
        """updates+apply; in flat mode both ride the raveled vector (tx is
        flat_ravel-wrapped: a bare array passes through it unchanged)."""
        if not flat:
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state
        g_flat, _ = ravel_pytree(grads)
        p_flat, unravel = ravel_pytree(params)
        u_flat, opt_state = tx.update(g_flat, opt_state, p_flat)
        return unravel(optax.apply_updates(p_flat, u_flat)), opt_state

    def forward_loss(params, batch_stats, batch, rng, step):
        # bf16 policy: master params stay f32 outside; compute runs bf16.
        # The cast happens INSIDE the differentiated function so its transpose
        # upcasts gradients back to f32 automatically (train/precision.py).
        params_c, batch_c = apply_policy(params, batch, mp)
        variables = {"params": params_c, "batch_stats": batch_stats}
        (pred, true), mut = model.apply(
            variables, batch_c, True, step,
            rngs={"dropout": rng,
                  "signflip": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"])
        pred = pred.astype(jnp.float32)
        mask = _loss_mask(cfg, batch, pred)
        loss = compute_loss(cfg, pred, true, mask)
        # stat-less models (Graphormer/LN-only): flax's mutable=["batch_stats"]
        # returns an EMPTY plain dict, while init_state stores FrozenDict() —
        # coerce so the TrainState pytree TYPE is step-stable (an AOT-compiled
        # step re-called with its own output tripped the mismatch, round 5)
        bs_out = mut.get("batch_stats", None) or FrozenDict()
        return loss, (bs_out, pred, true)

    def train_step(state: TrainState, batch: GraphBatch, rng):
        (loss, (bs, pred, true)), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(state.params, state.batch_stats, batch,
                                        rng, jnp.asarray(state.step))
        params, opt_state = tx_apply(grads, state.opt_state, state.params)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss, pred, true, _loss_mask(cfg, batch, pred)

    def grad_step(state: TrainState, batch_stats, batch: GraphBatch, rng,
                  grad_accum):
        # batch_stats is threaded explicitly so each micro-batch normalizes
        # with the PREVIOUS micro-batch's mutated running stats, matching the
        # reference's sequential-BN semantics (custom_train.py:33-39)
        (loss, (bs, pred, true)), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(state.params, batch_stats, batch,
                                        rng, jnp.asarray(state.step))
        grad_accum = jax.tree_util.tree_map(jnp.add, grad_accum, grads)
        return grad_accum, bs, loss, pred, true, _loss_mask(cfg, batch, pred)

    def apply_step(state: TrainState, grad_accum, bs, k: int):
        grads = jax.tree_util.tree_map(lambda g: g / k, grad_accum)
        params, opt_state = tx_apply(grads, state.opt_state, state.params)
        return TrainState(params=params, batch_stats=bs, opt_state=opt_state,
                          step=state.step + 1)

    def eval_step(state: TrainState, batch: GraphBatch):
        params_c, batch_c = apply_policy(state.params, batch, mp)
        variables = {"params": params_c, "batch_stats": state.batch_stats}
        pred, true = model.apply(variables, batch_c, False, mutable=False)
        pred = pred.astype(jnp.float32)
        mask = _loss_mask(cfg, batch, pred)
        loss = compute_loss(cfg, pred, true, mask)
        return loss, pred, true, mask

    return dict(train=train_step, grad=grad_step, apply=apply_step,
                eval=eval_step, forward=forward_loss)


def make_steps(cfg, model, tx, flat: Optional[bool] = None):
    """Build jitted (train_step, grad_step, apply_step, eval_step)."""
    raw = _build_raw_steps(cfg, model, tx, flat)
    donate = (0,) if cfg.parallel.donate else ()
    return (jax.jit(raw["train"], donate_argnums=donate),
            jax.jit(raw["grad"],
                    donate_argnums=(4,) if cfg.parallel.donate else ()),
            jax.jit(raw["apply"], static_argnums=(3,), donate_argnums=donate),
            jax.jit(raw["eval"]))


def scan_steps_core(cfg, model, tx, loader, flat_carry: Optional[bool] = None,
                    guard: bool = True):
    """Unjitted K-steps-per-dispatch scan body (see make_scan_steps).

    Exposed separately so train/multiseed.py can ``jax.vmap`` it over a
    leading seed axis before jitting.

    The arena pytree is a runtime ARGUMENT, never a closure capture: a
    closed-over device array becomes an HLO constant, and at PCQM4Mv2-full
    scale that embeds the whole multi-GB split into the compile payload
    (observed: remote-compile HTTP 413 at 1M graphs).

    ``flat_carry`` (defaults to whether the fused flat optimizer is active):
    carry params and batch_stats through the scan as ONE raveled vector each
    instead of ~150+~60 leaves. The step is op-count bound (~1 µs/kernel);
    per-leaf carries cost a while-loop copy, a filler-batch select, and an
    update add EACH per step, where the flat carry pays one of each. The
    gradient is taken w.r.t. the flat vector directly (the transpose of
    unravel is exactly the ravel the fused optimizer needs), so the per-leaf
    update unravel + apply_updates disappear too. Bitwise-identical math:
    same leaf order, same flat adds.

    ``guard``: emit the all-padding filler-batch selects (params/opt/stats
    must not move on a filler step). The host KNOWS at dispatch time whether
    a group contains a filler batch (only the trailing group of an epoch
    can), so make_scan_steps dispatches a guard-free executable for full
    groups — the guard's ~0.5 ms of whole-parameter jnp.where traffic
    (round-4 profile) is paid only by the one partial group per epoch."""
    from ..data.device_loader import assemble_impl

    if flat_carry is None:
        flat_carry = is_flat_tx(tx)
    raw_steps = _build_raw_steps(cfg, model, tx, flat_carry)
    Nmax, B = loader.max_nodes, loader.batch_size

    if not flat_carry:
        raw = raw_steps["train"]
        def k_steps(tree, state: TrainState, sels: jax.Array, rng):
            # sels: (K, B) int32 graph indices (−1 = padded slot)
            def body(st, inp):
                sel, i = inp
                batch = assemble_impl(tree, sel, Nmax, B)
                st2, loss, pred, true, mask = raw(
                    st, batch, jax.random.fold_in(rng, i))
                if not guard:
                    return st2, (loss, pred, true, mask)
                # the trailing group may contain ALL-padding filler batches:
                # they must not move params (adamW decays even on zero
                # grads), advance the step, or pollute BatchNorm running
                # stats — keep the old state for them (their log rows are
                # dropped host-side too)
                real = (sel >= 0).any()
                st_out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(real, a, b), st2, st)
                return st_out, (loss, pred, true, mask)

            K = sels.shape[0]
            state, (losses, preds, trues, masks) = jax.lax.scan(
                body, state, (sels, jnp.arange(K)))
            return state, losses, preds, trues, masks

        return k_steps

    from jax.flatten_util import ravel_pytree

    forward_loss = raw_steps["forward"]   # the ONE forward (shared with the
    # tree path and eager steps — any rng/loss/policy change applies to both)

    def k_steps(tree, state: TrainState, sels: jax.Array, rng):
        p_flat0, unravel_p = ravel_pytree(state.params)
        bs_flat0, unravel_bs = ravel_pytree(state.batch_stats)

        def fwd(p_flat, bs_flat, batch, rng_i, step):
            loss, (bs_tree, pred, true) = forward_loss(
                unravel_p(p_flat), unravel_bs(bs_flat), batch, rng_i, step)
            bs2 = ravel_pytree(bs_tree)[0]
            return loss, (bs2, pred, true, _loss_mask(cfg, batch, pred))

        def body(carry, inp):
            p_flat, bs_flat, opt_state, step = carry
            sel, i = inp
            batch = assemble_impl(tree, sel, Nmax, B)
            (loss, (bs2, pred, true, mask)), g_flat = jax.value_and_grad(
                fwd, has_aux=True)(p_flat, bs_flat, batch,
                                   jax.random.fold_in(rng, i), step)
            u_flat, opt2 = tx.update(g_flat, opt_state, p_flat)
            p2 = optax.apply_updates(p_flat, u_flat)
            if guard:
                # filler-batch guard (see the tree path above) — one select
                # per flat buffer instead of one per leaf
                real = (sel >= 0).any()
                p2 = jnp.where(real, p2, p_flat)
                bs2 = jnp.where(real, bs2, bs_flat)
                opt2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(real, a, b), opt2, opt_state)
                step2 = jnp.where(real, step + 1, step)
            else:
                step2 = step + 1
            return (p2, bs2, opt2, step2), (loss, pred, true, mask)

        K = sels.shape[0]
        carry0 = (p_flat0, bs_flat0, state.opt_state, jnp.asarray(state.step))
        (pf, bsf, opt, stp), (losses, preds, trues, masks) = jax.lax.scan(
            body, carry0, (sels, jnp.arange(K)))
        state = TrainState(params=unravel_p(pf), batch_stats=unravel_bs(bsf),
                           opt_state=opt, step=stp)
        return state, losses, preds, trues, masks

    return k_steps


def make_scan_steps(cfg, model, tx, loader, flat_carry: Optional[bool] = None):
    """K training steps per dispatch: ``lax.scan`` over device-assembled
    batches inside ONE jitted call (requires a DeviceLoader).

    On tiny-graph recipes (ZINC: ~0.25 ms of compute per step) the per-step
    dispatch latency dominates wall clock; scanning K steps amortizes one
    dispatch + one (K, B) index transfer over K optimizer steps. Enabled by
    ``cfg.train.steps_per_dispatch > 1``. Per-step losses/preds/trues/masks
    come back stacked for the logger.

    Guard-free dispatch (GGPS_SCAN_GUARD_SPLIT=1): pick a guard-free
    executable per dispatch via a HOST-side check on the numpy ``sels``
    when the group has no all-padding filler batch. OFF by default — the
    device-clock A/B at the pcqm-deep shape (round 5) measured the
    guard-free program consistently ~1 ms SLOWER (19.8 → 20.9 ms): the
    filler selects act as fusion anchors, and removing them fragments
    XLA's fusion groups (5158 → 5793 device events/step, GatedGCN-scope
    +0.6 ms). The guarded program pays ~0.5 ms of select traffic but wins
    net; docs/RESULTS.md round 5 records the experiment.
    """
    donate = (1,) if cfg.parallel.donate else ()
    tree = loader.arenas_tree
    jitted: Dict[bool, Any] = {}
    split = os.environ.get("GGPS_SCAN_GUARD_SPLIT") == "1"

    def run(state, sels, rng):
        need_guard = True
        if split:
            sels_h = np.asarray(sels) if isinstance(sels, np.ndarray) \
                else np.asarray(jax.device_get(sels))
            need_guard = not bool((sels_h >= 0).any(axis=-1).all())
        if need_guard not in jitted:
            jitted[need_guard] = jax.jit(
                scan_steps_core(cfg, model, tx, loader, flat_carry,
                                guard=need_guard),
                donate_argnums=donate)
        return jitted[need_guard](tree, state, jnp.asarray(sels), rng)

    return run


def make_fused_steps(cfg, model, tx, loader):
    """Train/eval steps with device-side batch ASSEMBLY fused into the jitted
    step: one dispatch per step whose only per-step input is the (B,) graph
    index vector (requires a DeviceLoader). Opt-in API: measured ~4% over the
    default two-dispatch loop at ZINC bs32, so custom_train keeps the simpler
    structure; this exists for latency-critical serving/step loops.
    """
    from ..data.device_loader import assemble_impl

    raw = _build_raw_steps(cfg, model, tx)
    tree = loader.arenas_tree
    Nmax, B = loader.max_nodes, loader.batch_size

    # arena tree as argument, not closure — see scan_steps_core
    def fused_train(t, state, sel, rng):
        batch = assemble_impl(t, sel, Nmax, B)
        return raw["train"](state, batch, rng)

    def fused_eval(t, state, sel):
        batch = assemble_impl(t, sel, Nmax, B)
        return raw["eval"](state, batch)

    donate = (1,) if cfg.parallel.donate else ()
    jt = jax.jit(fused_train, donate_argnums=donate)
    je = jax.jit(fused_eval)
    return (lambda state, sel, rng: jt(tree, state, sel, rng),
            lambda state, sel: je(tree, state, sel))


def init_state(cfg, model, example_batch: GraphBatch, seed: int,
               tx) -> TrainState:
    rng = run_key(cfg, seed)

    # ONE jitted dispatch for the whole init: eager flax init issues
    # hundreds of small ops, and through the axon tunnel each eager
    # dispatch pays a ~30 ms round trip — measured 78 s of pure init
    # latency at the ZINC shape (round 4). Jitted: a single dispatch.
    @jax.jit
    def _init(rng, batch):
        variables = model.init(
            {"params": rng, "dropout": rng, "signflip": rng}, batch, True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return params, batch_stats, tx.init(params)

    params, batch_stats, opt_state = _init(rng, example_batch)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def _to_host(pred, true, batch: GraphBatch, cfg):
    """Pull padded predictions to host and strip padding."""
    pred = np.asarray(jax.device_get(pred))
    true = np.asarray(jax.device_get(true)) if true is not None else None
    if pred.shape[0] == batch.num_graphs:
        m = np.asarray(jax.device_get(batch.graph_mask))
    elif pred.shape[0] == batch.num_graphs * batch.max_nodes:
        m = np.asarray(jax.device_get(batch.node_mask))
    elif "edge_label_mask" in batch.extras and pred.shape[0] == int(
            np.prod(batch.extras["edge_label_mask"].shape)):
        m = np.asarray(jax.device_get(
            batch.extras["edge_label_mask"])).reshape(-1)
    else:
        m = np.ones((pred.shape[0],), dtype=bool)
    return pred[m], (true[m] if true is not None else None)


def _drain_pending(pending, logger: SplitLogger, lr: float):
    """Host-pull an epoch's accumulated device results in ONE transfer.

    Keeping (pred, true, mask, loss) on device during the epoch avoids a host
    sync per step (the reference syncs every iteration,
    custom_train.py:30-31,40-46), and pulling the whole epoch as a single
    pytree amortizes the device→host round-trip latency once per epoch.
    Returns the host-side (pred, true, mask, loss) tuples so callers can
    compute further metrics without a second transfer.
    """
    if not pending:
        return []
    device_part = [(p, t, m, l) for p, t, m, l, _, _ in pending]
    host_part = jax.device_get(device_part)
    for (pred, true, mask, loss), (_, _, _, _, real, dt) in zip(host_part,
                                                                pending):
        pred = np.asarray(pred)
        true = np.asarray(true) if true is not None else None
        m = np.asarray(mask).reshape(-1)
        if m.shape[0] != pred.shape[0]:
            m = np.ones((pred.shape[0],), dtype=bool)
        logger.update_stats(pred[m], true[m] if true is not None else None,
                            float(loss), lr, dt, real)
    pending.clear()
    return host_part


# ---------------------------------------------------------------------------------
# Checkpointing (reference save_ckpt/load_ckpt/clean_ckpt capability +
# SURVEY.md §5 checkpoint/resume — orbax async-capable PyTree checkpoints)

def ckpt_dir(run_dir: str) -> str:
    return os.path.join(run_dir, "ckpt")


# Shared orbax AsyncCheckpointer: serialization + fsync run on a background
# thread so the train loop resumes immediately after the (fast) D2H fetch.
# One global instance — orbax requires waiting out the in-flight save before
# issuing the next, which wait_for_ckpts() does at every touch point.
_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_ckpts() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _needs_sharded_io(state: "TrainState") -> bool:
    """True when the state must be checkpointed shard-wise: any leaf is a
    jax.Array that this process cannot fully address (multi-host) or that is
    laid out across several devices (TP/FSDP-style param shards). Replicated
    single-process state keeps the simple host-gather path."""
    if jax.process_count() > 1:
        return True
    for leaf in jax.tree_util.tree_leaves(
            (state.params, state.batch_stats, state.opt_state)):
        if isinstance(leaf, jax.Array):
            if not leaf.is_fully_addressable:
                return True
            try:
                sh = leaf.sharding
            except Exception:       # pragma: no cover - tracer leaves
                continue
            if len(sh.device_set) > 1 and not sh.is_fully_replicated:
                return True
    return False


def _barrier(tag: str) -> None:
    """Cross-process sync point; no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def _snapshot_on_device(tree):
    """Copy every jax.Array leaf into a fresh device buffer with the SAME
    sharding. The train step donates state buffers, so an async writer must
    never hold the live arrays — it would race the next step's donation. The
    copy is HBM→HBM (cheap) and each process copies only its own shards."""
    def cp(x):
        if isinstance(x, jax.Array):
            return jnp.copy(x)
        return x
    return jax.tree_util.tree_map(cp, tree)


def save_ckpt(run_dir: str, state: TrainState, epoch: int,
              scheduler_state: Optional[dict] = None,
              async_save: bool = False) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir(run_dir), str(epoch)))
    if _needs_sharded_io(state):
        # multi-host / multi-device state: every process writes ONLY the
        # shards it owns (orbax tensorstore); no host gather, no broadcast.
        # On-device snapshot instead of device_get — same donation-safety
        # property, but the full array never has to fit one host.
        tree = {
            "params": _snapshot_on_device(state.params),
            "batch_stats": dict(_snapshot_on_device(state.batch_stats)),
            "opt_state": _snapshot_on_device(state.opt_state),
            "epoch": epoch,
            "scheduler": scheduler_state or {},
        }
    else:
        tree = {
            # device_get is synchronous ON PURPOSE: the train step donates
            # state buffers, so handing live device arrays to a background
            # writer would race the next step's donation. The host fetch is
            # the cheap part; the async win is overlapping serialization +
            # disk IO with compute.
            "params": jax.device_get(state.params),
            "batch_stats": dict(jax.device_get(state.batch_stats)),
            "opt_state": jax.device_get(state.opt_state),
            "epoch": epoch,
            "scheduler": scheduler_state or {},
        }
    # scheduler state also goes to a tiny JSON sidecar: its keys depend on
    # the scheduler (plateau: lr/best/num_bad), so a fixed restore template
    # can't name them — the sidecar spares load_ckpt a second full restore.
    # Directory surgery happens on process 0 only (shared filesystem), with
    # barriers so no process saves into a dir another is still deleting.
    if jax.process_index() == 0:
        os.makedirs(ckpt_dir(run_dir), exist_ok=True)
        with open(path + ".sched.json", "w") as f:
            json.dump(scheduler_state or {}, f)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()      # previous save must commit first
        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        _barrier(f"ckpt_save_{epoch}")
        ckptr.save(path, tree)
        return
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    _barrier(f"ckpt_save_{epoch}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_ckpt(run_dir: str, state: TrainState,
              epoch: int = -1) -> Tuple[TrainState, int, dict]:
    """Restore latest (or given) epoch; returns (state, next_epoch, sched_state)."""
    import orbax.checkpoint as ocp

    wait_for_ckpts()                      # async saves must land before read
    d = ckpt_dir(run_dir)
    if not os.path.isdir(d):
        return state, 0, {}
    epochs = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    if not epochs:
        return state, 0, {}
    target = epoch if epoch >= 0 and epoch in epochs else epochs[-1]
    path = os.path.abspath(os.path.join(d, str(target)))
    with ocp.PyTreeCheckpointer() as ckptr:
        # the template pins the opt_state container structure (optax
        # NamedTuples) and array dtypes; the scheduler dict's keys depend on
        # the scheduler that SAVED the ckpt (plateau: lr/best/num_bad), so it
        # is excluded here (partial_restore) and read back raw below
        restore_args = None
        if _needs_sharded_io(state):
            # sharded resume: every leaf restores DIRECTLY onto the live
            # state's mesh layout — each process reads only its own shards,
            # nothing is materialized host-side. The fresh state the driver
            # built for this run carries the target NamedShardings.
            def abstract(x):
                if isinstance(x, jax.Array):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                sharding=x.sharding)
                return x
            template = {
                "params": jax.tree_util.tree_map(abstract, state.params),
                "batch_stats": dict(
                    jax.tree_util.tree_map(abstract, state.batch_stats)),
                "opt_state": jax.tree_util.tree_map(abstract,
                                                    state.opt_state),
                "epoch": 0,
            }
            restore_args = ocp.checkpoint_utils.construct_restore_args(
                template)
        else:
            template = {
                "params": jax.device_get(state.params),
                "batch_stats": dict(jax.device_get(state.batch_stats)),
                "opt_state": jax.device_get(state.opt_state),
                "epoch": 0,
            }
        try:
            restored = ckptr.restore(path, item=template,
                                     restore_args=restore_args,
                                     partial_restore=True)
        except Exception as e:
            raise RuntimeError(
                f"checkpoint restore failed for {d}/{target}: {e}\n"
                "If this run's checkpoints predate the fused flat optimizer "
                "(optim.fused_flat, round 2) the opt_state layout changed — "
                "resume with 'optim.fused_flat False' (or delete the ckpt "
                "dir to restart).") from e
        side = path + ".sched.json"
        if os.path.exists(side):
            with open(side) as f:
                sched = json.load(f)
        else:
            # legacy checkpoint without a sidecar: fish the scheduler dict
            # out of a raw restore (reads the full tree — resume-time only)
            try:
                sched = dict(ckptr.restore(path).get("scheduler") or {})
            except Exception as e:
                log.warning("could not read scheduler state from %s (%s) — "
                            "resuming with a fresh scheduler", path, e)
                sched = {}
    new_state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=state.step)
    return new_state, restored["epoch"] + 1, sched


def clean_ckpt(run_dir: str, keep_epoch, wait: bool = True) -> None:
    """Delete all checkpoint epochs except ``keep_epoch`` (an int or a
    collection of ints). ``wait=False`` skips the async-write barrier — only
    safe when every kept epoch includes the one currently being written."""
    if wait:
        wait_for_ckpts()                  # never rmtree under an async write
    if jax.process_index() != 0:          # shared-fs surgery: process 0 only
        return
    keep = {keep_epoch} if isinstance(keep_epoch, int) else set(keep_epoch)
    d = ckpt_dir(run_dir)
    if not os.path.isdir(d):
        return
    for x in os.listdir(d):
        # "<epoch>", "<epoch>.sched.json", and stale
        # "<epoch>.orbax-checkpoint-tmp-<ts>" dirs left by a crashed async
        # save all key off the leading epoch number
        head = x.split(".", 1)[0]
        if head.isdigit() and int(head) not in keep:
            p = os.path.join(d, x)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass


# ---------------------------------------------------------------------------------
# Preemption-safe elastic recovery (SURVEY.md §5 failure detection: the
# reference has nothing beyond auto_resume; TPU pods DO get preempted, with a
# SIGTERM grace window). The handler only sets a flag — the epoch loop checks
# it at the next epoch boundary, checkpoints SYNCHRONOUSLY (the process may be
# SIGKILLed right after the grace period) and returns cleanly, so a relaunch
# with train.auto_resume continues from the saved epoch.

_PREEMPT = threading.Event()


def request_preemption(*_sig_args) -> None:
    """Signal-handler-compatible; also callable directly (tests, notebooks)."""
    _PREEMPT.set()


def clear_preemption() -> None:
    _PREEMPT.clear()


def install_preemption_handler(signals=(signal.SIGTERM, signal.SIGUSR1)) -> None:
    """Route preemption notices to the flag. Idempotent; silently skipped off
    the main thread (signal.signal is main-thread-only)."""
    try:
        for s in signals:
            signal.signal(s, request_preemption)
    except ValueError:
        log.warning("not on the main thread — preemption signals not hooked "
                    "(call train.loop.request_preemption() directly instead)")


def preemption_requested() -> bool:
    """Did any process get a preemption notice? Multi-host runs agree via an
    allgather so every process takes the checkpoint-and-exit branch together
    (divergent control flow would deadlock the next collective)."""
    flag = _PREEMPT.is_set()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        flag = bool(np.asarray(multihost_utils.process_allgather(
            np.asarray([flag]))).any())
    return flag


# ---------------------------------------------------------------------------------
# Epoch loops

def is_eval_epoch(cfg, epoch: int) -> bool:
    return (epoch + 1) % max(1, cfg.train.eval_period) == 0 or \
        epoch == cfg.optim.max_epoch - 1 or epoch == 0


def is_ckpt_epoch(cfg, epoch: int) -> bool:
    return (epoch + 1) % max(1, cfg.train.ckpt_period) == 0 or \
        epoch == cfg.optim.max_epoch - 1


def train_epoch(cfg, state, loaders_train: BatchLoader, logger: SplitLogger,
                train_step, grad_step, apply_step, lr: float, rng, mesh=None):
    from ..data.prefetch import prefetch

    accum = max(1, cfg.optim.batch_accumulation)
    zero_grads = None
    n_accum = 0
    bs_latest = state.batch_stats
    results = []
    t_epoch = time.time()
    for it, (real, batch) in enumerate(prefetch(loaders_train, mesh)):
        t0 = time.time()
        rng, sub = jax.random.split(rng)
        if accum == 1:
            state, loss, pred, true, mask = train_step(state, batch, sub)
        else:
            if n_accum == 0:
                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            # thread the mutated batch_stats through the micro-batch chain so
            # every micro-batch's BN update survives (reference sequential-BN)
            zero_grads, bs_latest, loss, pred, true, mask = grad_step(
                state, bs_latest, batch, sub, zero_grads)
            n_accum += 1
            if n_accum == accum:
                state = apply_step(state, zero_grads, bs_latest, accum)
                n_accum = 0
        results.append((pred, true, mask, loss, real, time.time() - t0))
    if accum > 1 and n_accum:
        state = apply_step(state, zero_grads, bs_latest, n_accum)
    # steps are dispatched asynchronously, so per-iter dts above measure only
    # dispatch; report true wall time spread uniformly over the iterations
    jax.block_until_ready(state.params)
    wall = time.time() - t_epoch
    n = max(len(results), 1)
    results = [(p, t, m, l, r, wall / n) for (p, t, m, l, r, _) in results]
    _drain_pending(results, logger, lr)
    return state, rng


def train_epoch_scan(cfg, state, loader, logger: SplitLogger, multi_step,
                     lr: float, rng):
    """Epoch driver for the K-steps-per-dispatch path (make_scan_steps).

    Mirrors DeviceLoader's per-epoch shuffle; the trailing partial GROUP is
    padded with all-(−1) batches whose masks are empty, so their loss rows are
    dropped before logging (same compile either way)."""
    K = max(1, cfg.train.steps_per_dispatch)
    B = loader.batch_size
    n = loader.arenas.num_graphs_total
    idx = np.arange(n)
    if loader.shuffle:
        np.random.default_rng(loader.seed + loader.epoch).shuffle(idx)
    loader.epoch += 1
    n_batches = -(-n // B)
    n_groups = -(-n_batches // K)
    sel = -np.ones((n_groups * K * B,), np.int64)
    sel[:n] = idx
    sel = sel.reshape(n_groups, K, B).astype(np.int32)
    reals = (sel >= 0).sum(axis=2)  # (n_groups, K)

    results = []
    t_epoch = time.time()
    rng, base = jax.random.split(rng)
    for gi in range(n_groups):
        # sel stays numpy so multi_step's host-side filler check is free
        state, losses, preds, trues, masks = multi_step(
            state, sel[gi], jax.random.fold_in(base, gi))
        for k in range(K):
            if reals[gi, k] == 0:
                continue
            results.append((preds[k], trues[k] if trues is not None else None,
                            masks[k], losses[k], int(reals[gi, k]), 0.0))
    jax.block_until_ready(state.params)
    wall = time.time() - t_epoch
    m = max(len(results), 1)
    results = [(p, t, mk, l, r, wall / m) for (p, t, mk, l, r, _) in results]
    _drain_pending(results, logger, lr)
    return state, rng


def eval_epoch(cfg, state, loader: BatchLoader, logger: SplitLogger, eval_step,
               mesh=None):
    from ..data.prefetch import prefetch

    results = []
    ranking = []   # (batch_index, edge_label, edge_label_mask) for MRR
    t_epoch = time.time()
    for real, batch in prefetch(loader, mesh):
        t0 = time.time()
        loss, pred, true, mask = eval_step(state, batch)
        results.append((pred, true, mask, loss, real, time.time() - t0))
        lab = batch.extras.get("edge_label")
        if lab is not None and lab.ndim == 2:
            ranking.append((len(results) - 1, lab,
                            batch.extras.get("edge_label_mask")))
    # report true wall time (async dispatch — see train_epoch)
    if results:
        jax.block_until_ready(results[-1][0])
    wall = time.time() - t_epoch
    n = max(len(results), 1)
    results = [(p, t, m, l, r, wall / n) for (p, t, m, l, r, _) in results]
    host_results = _drain_pending(results, logger, 0.0)
    if ranking:
        logger.add_epoch_metrics(_ranking_metrics(ranking, host_results))


def _ranking_metrics(ranking, host_results) -> Dict[str, float]:
    """Per-graph MRR/Hits@k: each positive ranked against the SAME graph's
    negatives (reference head/inductive_edge.py:115-155 semantics). Reuses
    the predictions already drained to host; only the small label arrays are
    transferred here."""
    from ..metrics import mrr_hits

    labels_host = jax.device_get([(lab, lm) for _, lab, lm in ranking])
    agg: Dict[str, List[float]] = {}
    for (ri, _, _), (lab, lmask) in zip(ranking, labels_host):
        pred = np.asarray(host_results[ri][0]).reshape(np.asarray(lab).shape)
        lab = np.asarray(lab)
        lm = (np.asarray(lmask).astype(bool) if lmask is not None
              else np.ones_like(lab, dtype=bool))
        for b in range(lab.shape[0]):
            pos = pred[b][(lab[b] == 1) & lm[b]]
            neg = pred[b][(lab[b] == 0) & lm[b]]
            if pos.size == 0 or neg.size == 0:
                continue
            stats = mrr_hits(pos, np.broadcast_to(neg, (pos.size, neg.size)))
            for k, v in stats.items():
                agg.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in agg.items() if v}


def maybe_init_wandb(cfg):
    """W&B run handle when enabled and installed (reference
    custom_train.py:102-113 + utils.py:108-144 auto-naming); None otherwise."""
    if not cfg.wandb.use:
        return None
    try:
        import wandb
    except ImportError:
        log.warning("wandb.use=True but wandb is not installed — disabled")
        return None
    name = cfg.wandb.name or (
        f"{cfg.dataset.format}-{cfg.dataset.name}.{cfg.model.type}"
        f".{cfg.gt.layer_type}.s{cfg.seed}")
    return wandb.init(entity=cfg.wandb.entity or None,
                      project=cfg.wandb.project, name=name,
                      config=cfg.to_dict() if hasattr(cfg, "to_dict") else None)


# ---------------------------------------------------------------------------------
# Train modes (registered like reference train_dict, main.py:166-167)

def _metric_cmp(metric_agg: str):
    return (lambda a, b: a < b) if metric_agg == "argmin" else (lambda a, b: a > b)


@register_train("custom")
def custom_train(cfg, loaders: Dict[str, BatchLoader], model, state: TrainState,
                 run_dir: str, mesh=None,
                 trainable_mask=None) -> Dict[str, List[Dict]]:
    """The main epoch loop (reference custom_train.py:80-212)."""
    tx = make_tx(cfg, trainable_mask)
    train_step, grad_step, apply_step, eval_step = make_steps(cfg, model, tx)
    multi_step = None
    if (cfg.train.get("steps_per_dispatch", 1) > 1
            and max(1, cfg.optim.batch_accumulation) == 1 and mesh is None):
        from ..data.device_loader import DeviceLoader
        if isinstance(loaders.get("train"), DeviceLoader):
            multi_step = make_scan_steps(cfg, model, tx, loaders["train"])
        else:
            log.warning("train.steps_per_dispatch>1 needs a DeviceLoader "
                        "(dataset without host-collated extras) — falling "
                        "back to one step per dispatch")
    schedule = build_schedule(cfg)
    plateau = isinstance(schedule, ReduceLROnPlateau)
    metric = resolve_metric_best(cfg)
    agg = cfg.metric_agg
    if cfg.metric_best == "auto" and metric in ("mae", "mse", "rmse", "loss"):
        agg = "argmin"
    better = _metric_cmp(agg)

    wandb_run = maybe_init_wandb(cfg)
    loggers = {s: SplitLogger(s, run_dir, cfg.dataset.task_type, cfg.model.thresh,
                              tensorboard=cfg.tensorboard_each_run,
                              wandb_run=wandb_run)
               for s in loaders}
    for lg in loggers.values():
        lg.params = cfg.share.get("params", 0)
    start_epoch = 0
    if cfg.train.auto_resume:
        state, start_epoch, sched_state = load_ckpt(run_dir, state,
                                                    cfg.train.epoch_resume)
        if plateau and sched_state:
            schedule.load_state_dict(sched_state)

    if cfg.train.get("preempt_save", True):
        install_preemption_handler()
    rng = run_key(cfg, cfg.seed + 1234)
    best_val = None
    best_epoch = -1
    prev_best_ckpt = None   # last best-epoch ckpt whose write has committed
    preempted_epoch = None  # epoch checkpointed on a preemption notice
    history: Dict[str, List[Dict]] = {s: [] for s in loaders}
    full_epoch_times = []
    profiled = False
    for epoch in range(start_epoch, cfg.optim.max_epoch):
        lr = schedule.lr if plateau else schedule(epoch)
        set_lr(state.opt_state, lr)
        # profile the first POST-compile epoch (jax.profiler device trace,
        # SURVEY.md §5 tracing gap — view with tensorboard or xprof); with a
        # single remaining epoch, profile it (compile noise beats no trace)
        single_epoch = cfg.optim.max_epoch - start_epoch == 1
        profile_this = (cfg.train.get("profiler", False) and not profiled
                        and (epoch == start_epoch + 1
                             or (single_epoch and epoch == start_epoch)))
        if profile_this:
            jax.profiler.start_trace(os.path.join(run_dir, "profile"))
        t0 = time.time()
        if multi_step is not None:
            state, rng = train_epoch_scan(cfg, state, loaders["train"],
                                          loggers["train"], multi_step, lr, rng)
        else:
            state, rng = train_epoch(cfg, state, loaders["train"],
                                     loggers["train"], train_step, grad_step,
                                     apply_step, lr, rng, mesh)
        if profile_this:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiled = True
            log.info("profiler trace written to %s",
                     os.path.join(run_dir, "profile"))
        full_epoch_times.append(time.time() - t0)
        # SAN learnable-γ epoch logging (reference custom_train.py:194-200):
        # surface each layer's effective γ = sigmoid(logit) in stats.json
        gammas = [leaf for path, leaf in
                  jax.tree_util.tree_leaves_with_path(state.params)
                  if path and getattr(path[-1], "key", None) == "gamma"]
        if gammas:
            loggers["train"].add_epoch_metrics(
                {f"gamma_{i}": float(jax.nn.sigmoid(jnp.asarray(g)))
                 for i, g in enumerate(gammas)})
        stats = loggers["train"].write_epoch(epoch)
        history["train"].append(stats)

        if is_eval_epoch(cfg, epoch):
            for split in ("val", "test"):
                if split in loaders:
                    eval_epoch(cfg, state, loaders[split], loggers[split],
                               eval_step, mesh)
                    s = loggers[split].write_epoch(epoch)
                    history[split].append(s)
            val_hist = history.get("val") or history["train"]
            if metric not in val_hist[-1] and best_epoch < 0:
                # switch the SELECTION to loss/argmin for the whole run —
                # falling back per-epoch while keeping an argmax direction
                # would pin "best" at the first epoch forever (round 5: a
                # metric_best/stats-key mismatch poisoned AUROC selection)
                log.warning(
                    "selection metric %r missing from %s stats (keys: %s) — "
                    "selecting on loss (argmin) instead; check "
                    "cfg.metric_best", metric,
                    "val" if "val" in loaders else "train",
                    sorted(val_hist[-1].keys()))
                metric, agg = "loss", "argmin"
                better = _metric_cmp(agg)
            cur = val_hist[-1].get(metric, val_hist[-1]["loss"])
            if plateau:
                schedule.update(cur)
            if best_val is None or better(cur, best_val):
                best_val = cur
                best_epoch = epoch
                if cfg.train.enable_ckpt and cfg.train.ckpt_best:
                    # save_ckpt waits out the previous async write, so after
                    # it returns the PREVIOUS best is committed and this
                    # epoch's write is in flight. Keep both (the committed
                    # one is the crash fallback until this write lands) and
                    # prune older dirs without blocking on the new write.
                    save_ckpt(run_dir, state, epoch,
                              schedule.state_dict() if plateau else None,
                              async_save=cfg.train.get("ckpt_async", True))
                    if cfg.train.ckpt_clean:
                        if prev_best_ckpt is None:
                            # first save of the run: older dirs (e.g. the
                            # resume source) may be pruned only after this
                            # write commits — pay the one-time wait
                            clean_ckpt(run_dir, epoch)
                        else:
                            clean_ckpt(run_dir, {epoch, prev_best_ckpt},
                                       wait=False)
                    prev_best_ckpt = epoch
            eta = (np.mean(full_epoch_times[1:] or full_epoch_times)
                   * (cfg.optim.max_epoch - epoch - 1))
            log.info("epoch %d lr %.2e %s %s=%.5f (best %.5f @ %d) "
                     "epoch_time %.2fs eta %.0fs", epoch, lr,
                     "val" if "val" in loaders else "train", metric, cur,
                     best_val, best_epoch, full_epoch_times[-1], eta)
        if cfg.train.enable_ckpt and not cfg.train.ckpt_best \
                and is_ckpt_epoch(cfg, epoch):
            save_ckpt(run_dir, state, epoch,
                      schedule.state_dict() if plateau else None,
                      async_save=cfg.train.get("ckpt_async", True))
        if cfg.train.get("preempt_save", True) and preemption_requested():
            # synchronous save: the grace window may end in SIGKILL, so the
            # write must be committed before we report a clean stop
            save_ckpt(run_dir, state, epoch,
                      schedule.state_dict() if plateau else None,
                      async_save=False)
            preempted_epoch = epoch
            log.warning("preemption notice received — checkpointed epoch %d "
                        "and stopping; relaunch with train.auto_resume True "
                        "to continue", epoch)
            break
    wait_for_ckpts()                      # commit the tail save before return
    if (cfg.train.enable_ckpt and cfg.train.ckpt_best and cfg.train.ckpt_clean
            and prev_best_ckpt is not None):
        # drop the crash-fallback dir — but never the preemption save, which
        # is what the auto_resume relaunch restarts from
        keep = {prev_best_ckpt}
        if preempted_epoch is not None:
            keep.add(preempted_epoch)
        clean_ckpt(run_dir, keep)
    log.info("avg epoch time: %.2fs; best %s %s=%.5f @ epoch %d",
             float(np.mean(full_epoch_times)) if full_epoch_times else 0.0,
             "val", metric, best_val if best_val is not None else float("nan"),
             best_epoch)
    return history


@register_train("inference-only")
def inference_only(cfg, loaders, model, state, run_dir, mesh=None,
                   trainable_mask=None):
    """Evaluate all splits without touching the optimizer
    (reference custom_train.py:215-260)."""
    tx = make_tx(cfg)
    _, _, _, eval_step = make_steps(cfg, model, tx)
    history = {}
    for split, loader in loaders.items():
        lg = SplitLogger(split, run_dir, cfg.dataset.task_type, cfg.model.thresh)
        eval_epoch(cfg, state, loader, lg, eval_step, mesh)
        history[split] = [lg.write_epoch(0)]
    return history


@register_train("PCQM4Mv2-inference")
def ogblsc_inference(cfg, loaders, model, state, run_dir, mesh=None,
                     trainable_mask=None):
    """OGB-LSC submission writer (reference custom_train.py:263-310): evaluate
    valid with MAE; write y_pred .npz submission files for splits whose targets
    are all-NaN (test-dev / test-challenge convention)."""
    tx = make_tx(cfg)
    _, _, _, eval_step = make_steps(cfg, model, tx)
    history = {}
    for split, loader in loaders.items():
        from ..data.prefetch import prefetch as _prefetch
        preds, trues = [], []
        for _real, batch in _prefetch(loader, mesh):
            _, pred, true, _mask = eval_step(state, batch)
            p, t = _to_host(pred, true, batch, cfg)
            preds.append(p)
            trues.append(t)
        pred = np.concatenate(preds).reshape(-1)
        true = np.concatenate(trues).reshape(-1) if trues[0] is not None else None
        if true is not None and np.isnan(true).all():
            # held-out split: write submission file (reference :294-308)
            out = os.path.join(run_dir, f"y_pred_pcqm4m-v2_{split}.npz")
            np.savez_compressed(out, y_pred=pred.astype(np.float32))
            log.info("%s: wrote submission %s (%d preds)", split, out, len(pred))
            history[split] = [dict(n=len(pred), submission=out)]
        else:
            m = ~np.isnan(true)
            mae = float(np.abs(pred[m] - true[m]).mean()) if m.any() else 0.0
            log.info("%s: MAE %.5f over %d", split, mae, int(m.sum()))
            history[split] = [dict(mae=mae, n=int(m.sum()))]
    return history


@register_train("log-attn-weights")
def log_attn_weights_mode(cfg, loaders, model, state, run_dir, mesh=None,
                          trainable_mask=None):
    """Harvest per-GPS-layer attention over the test split and save
    graph_attn_stats.npz (reference custom_train.py:313-385). Requires
    cfg.train.log_attn_weights=True so GPS layers sow their attention."""
    import jax

    loader = loaders.get("test") or next(iter(loaders.values()))
    all_stats = []
    for bi, item in enumerate(loader):
        batch = item[1] if isinstance(item, tuple) else item.to_graph_batch()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        (pred, true), inter = model.apply(variables, batch, False,
                                          mutable=["intermediates"])
        nmask = np.asarray(jax.device_get(batch.node_mask)).reshape(
            batch.num_graphs, batch.max_nodes)
        layer_attns = []
        for path, vals in _iter_sown(inter.get("intermediates", {})):
            layer_attns.append(np.asarray(jax.device_get(vals[0])))
        if layer_attns:
            all_stats.append(dict(batch=bi,
                                  attn=np.stack(layer_attns),  # (L,B,H,N,N)
                                  node_mask=nmask))
    out = os.path.join(run_dir, "graph_attn_stats.npz")
    np.savez_compressed(out, **{f"batch_{s['batch']}_attn": s["attn"]
                                for s in all_stats},
                        **{f"batch_{s['batch']}_mask": s["node_mask"]
                           for s in all_stats})
    log.info("saved attention stats for %d batches to %s", len(all_stats), out)
    return {"test": [dict(batches=len(all_stats), path=out)]}


def _iter_sown(tree, path=()):
    """Yield (path, value) for flax sow'd leaves in deterministic order."""
    if isinstance(tree, (tuple, list)):
        yield path, tree
        return
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _iter_sown(v, path + (k,))
        else:
            yield path + (k,), v
