"""Optimizers + LR schedules (optax).

Capability parity with /root/reference/graphgps/optimizer/extra_optimizers.py:
optimizers adam/adamW/adagrad/sgd (:15-24 + GraphGym's), schedulers
linear/cosine/polynomial-with-warmup (:92-240, HF-transformers formulas) and
reduce_on_plateau (:44-89). The reference steps schedulers per EPOCH
(custom_train.py:135-138); we keep that semantic — the schedule is a function of
the epoch index, applied via optax.scale_by_learning_rate with injected LR.

Gradient clipping and accumulation (reference custom_train.py:33-39,
optimizers_config.py) live in the train step (train/loop.py), composed from optax
transforms here.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import optax

from ..registry import register_optimizer, register_scheduler, optimizer_dict, scheduler_dict


# ---------------------------------------------------------------------------------
# Optimizers (LR is injected per-epoch through optax.inject_hyperparams)

@register_optimizer("adam")
def _adam(lr, cfg):
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


@register_optimizer("adamW")
def _adamw(lr, cfg):
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, weight_decay=cfg.optim.weight_decay)


@register_optimizer("adagrad")
def _adagrad(lr, cfg):
    return optax.inject_hyperparams(optax.adagrad)(learning_rate=lr)


@register_optimizer("sgd")
def _sgd(lr, cfg):
    return optax.inject_hyperparams(optax.sgd)(
        learning_rate=lr, momentum=cfg.optim.momentum)


# ---------------------------------------------------------------------------------
# Epoch-indexed schedules (HF-transformers formulas, reference :125-240)

@register_scheduler("linear_with_warmup")
def linear_with_warmup(cfg) -> Callable[[int], float]:
    base, warm, total = cfg.optim.base_lr, cfg.optim.num_warmup_epochs, cfg.optim.max_epoch

    def f(epoch: int) -> float:
        if epoch < warm:
            return base * epoch / max(1, warm)
        return base * max(0.0, (total - epoch) / max(1, total - warm))

    return f


@register_scheduler("cosine_with_warmup")
def cosine_with_warmup(cfg) -> Callable[[int], float]:
    base, warm, total = cfg.optim.base_lr, cfg.optim.num_warmup_epochs, cfg.optim.max_epoch
    num_cycles = 0.5

    def f(epoch: int) -> float:
        if epoch < warm:
            return base * epoch / max(1, warm)
        progress = (epoch - warm) / max(1, total - warm)
        return base * max(0.0, 0.5 * (1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)))

    return f


@register_scheduler("polynomial_with_warmup")
def polynomial_with_warmup(cfg) -> Callable[[int], float]:
    base, warm, total = cfg.optim.base_lr, cfg.optim.num_warmup_epochs, cfg.optim.max_epoch
    lr_end, power = cfg.optim.min_lr, 1.0

    def f(epoch: int) -> float:
        if epoch < warm:
            return base * epoch / max(1, warm)
        if epoch > total:
            return lr_end
        lr_range = base - lr_end
        remaining = 1 - (epoch - warm) / max(1, total - warm)
        return lr_range * remaining ** power + lr_end

    return f


@register_scheduler("none")
def constant(cfg) -> Callable[[int], float]:
    base = cfg.optim.base_lr
    return lambda epoch: base


@register_scheduler("step")
def step_schedule(cfg) -> Callable[[int], float]:
    base, steps, decay = cfg.optim.base_lr, list(cfg.optim.steps), cfg.optim.lr_decay

    def f(epoch: int) -> float:
        k = sum(1 for s in steps if epoch >= s)
        return base * decay ** k

    return f


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler state (reference extra_optimizers.py:44-89).

    ``update(metric)`` is called once per eval epoch; ``lr`` is then injected into
    the optimizer. Mode follows cfg.metric_agg (argmin for losses/MAE).
    """

    base_lr: float
    factor: float = 0.5
    patience: int = 10
    mode: str = "min"
    min_lr: float = 0.0
    eps: float = 1e-8

    lr: float = dataclasses.field(default=0.0)
    best: float = dataclasses.field(default=math.inf)
    num_bad: int = dataclasses.field(default=0)

    def __post_init__(self):
        self.lr = self.base_lr
        self.best = math.inf if self.mode == "min" else -math.inf

    def update(self, metric: float) -> float:
        better = (metric < self.best - self.eps if self.mode == "min"
                  else metric > self.best + self.eps)
        if better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return dict(lr=self.lr, best=self.best, num_bad=self.num_bad)

    def load_state_dict(self, d: dict) -> None:
        self.lr, self.best, self.num_bad = d["lr"], d["best"], d["num_bad"]


@register_scheduler("reduce_on_plateau")
def reduce_on_plateau(cfg):
    # Returns the plateau object; the train loop special-cases it (host state).
    mode = "min" if cfg.metric_agg == "argmin" or cfg.dataset.task_type == "regression" else "max"
    return ReduceLROnPlateau(base_lr=cfg.optim.base_lr, factor=cfg.optim.reduce_factor,
                             patience=cfg.optim.schedule_patience, mode=mode,
                             min_lr=cfg.optim.min_lr)


# ---------------------------------------------------------------------------------

def build_schedule(cfg):
    name = cfg.optim.scheduler
    if name not in scheduler_dict:
        raise ValueError(f"unknown scheduler {name!r}; have {sorted(scheduler_dict)}")
    return scheduler_dict[name](cfg)


def build_optimizer(cfg) -> optax.GradientTransformation:
    name = cfg.optim.optimizer
    if name not in optimizer_dict:
        raise ValueError(f"unknown optimizer {name!r}; have {sorted(optimizer_dict)}")
    return optimizer_dict[name](cfg.optim.base_lr, cfg)


def flat_ravel(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run a gradient transformation over the ravel-flattened param vector.

    GraphGPS-size models have ~150 parameter leaves; per-leaf optimizer
    arithmetic costs ~1,000 tiny TPU kernels per step (profiled: the flagship
    scan step is op-count bound at ~1 us/kernel, not FLOP bound). Raveling
    grads/params to ONE vector turns clip+Adam into a handful of fused
    kernels and collapses the moment buffers carried through lax.scan from
    ~300 leaves to two. Numerics: identical update math; the global-norm
    reduction changes float association (per-leaf partial sums → one sum),
    parity-tested to 1e-6.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(updates, state, params=None):
        g_flat, unravel = ravel_pytree(updates)
        p_flat = ravel_pytree(params)[0] if params is not None else None
        u_flat, state = tx.update(g_flat, state, p_flat)
        return unravel(u_flat), state

    # marker read by train/loop.py to pick the flat update/carry fast paths —
    # detecting from the tx itself can never disagree with the tx actually
    # passed (a cfg-derived predicate can, e.g. a freeze-masked tx)
    update._ggps_flat = True
    return optax.GradientTransformation(init, update)


def is_flat_tx(tx: optax.GradientTransformation) -> bool:
    """True iff ``tx`` was wrapped by flat_ravel (accepts raveled vectors)."""
    return getattr(tx.update, "_ggps_flat", False)


def fused_flat_active(cfg, trainable_mask=None) -> bool:
    """True when make_tx wraps the chain in flat_ravel (see there): no
    finetune freeze mask, fused_flat not disabled, no tensor parallelism."""
    mesh_shape = list(cfg.parallel.get("mesh_shape", []) or [])
    tp = (cfg.parallel.get("model_axis", 1) or 1) > 1 or (
        len(mesh_shape) == 2 and mesh_shape[1] > 1)
    return (trainable_mask is None and bool(cfg.optim.get("fused_flat", True))
            and not tp)


def make_tx(cfg, trainable_mask=None) -> optax.GradientTransformation:
    """Full gradient transform: [clip] → [freeze body] → optimizer(injected lr).

    ``trainable_mask`` is a params-shaped bool pytree (True = trainable); frozen
    leaves get zero updates (the finetuning freeze_main capability,
    reference finetuning.py:144-152).
    """
    import jax as _jax

    parts = []
    if trainable_mask is not None:
        # zero frozen-body gradients BEFORE clipping so the global-norm clip
        # sees only trainable gradients (matching the reference's
        # requires_grad_=False semantics, finetuning.py:144-152) — otherwise
        # a large frozen body's norm would scale the head's updates down
        frozen = _jax.tree_util.tree_map(lambda t: not t, trainable_mask)
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    if cfg.optim.clip_grad_norm:
        parts.append(optax.clip_by_global_norm(cfg.optim.clip_grad_norm_value))
    opt = build_optimizer(cfg)
    if trainable_mask is not None:
        # multi_transform applies the optimizer to the trainable subset only:
        # no moment buffers or update compute for frozen params, and no adamW
        # weight decay on them. (Plain optax.masked would pass unmasked
        # leaves' updates through as raw gradients.)
        labels = _jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels)
    parts.append(opt)
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    # fused flat optimizer (see flat_ravel). Off when finetune-freezing
    # (leaf-level masks) or tensor parallelism (opt_state must mirror the
    # param-leaf shardings, parallel/tensor.py) is in play. TP can be
    # declared via model_axis OR mesh_shape=[data, model] (mesh.py make_mesh).
    if fused_flat_active(cfg, trainable_mask):
        tx = flat_ravel(tx)
    return tx


def set_lr(opt_state, lr: float):
    """Inject a new learning rate into an inject_hyperparams optimizer state
    (possibly nested inside an optax.chain)."""
    import jax.numpy as jnp

    def walk(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=s.hyperparams["learning_rate"].dtype)
            return True
        if isinstance(s, (tuple, list)):
            return any([walk(x) for x in s])
        if isinstance(s, dict):  # e.g. multi_transform inner_states
            return any([walk(x) for x in s.values()])
        return False

    walk(opt_state)
    return opt_state
