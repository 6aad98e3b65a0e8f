"""Minimal torch_geometric/torch_scatter/yacs stubs that let the REFERENCE
repo's layer modules (/root/reference/graphgps) execute on CPU torch, so
their activations can be extracted as parity fixtures (SURVEY §7.3.4; VERDICT
r2 next #7 — reference-extracted oracles instead of numpy re-derivations).

Nothing here is part of the training framework: this is test/fixture tooling
only. The stubs implement exactly the surface the imported reference modules
touch, with PyG's documented semantics:

- ``torch_scatter.scatter(src, index, dim, out, dim_size, reduce)``
- ``MessagePassing.propagate`` with ``_i``/``_j`` suffix resolution
  (flow source_to_target: ``_j`` = edge_index[0] = sender, ``_i`` =
  edge_index[1] = receiver), custom message/aggregate/update dispatch
- ``torch_geometric.utils.{scatter, degree, remove_self_loops}``
- graphgym ``register`` / ``config.cfg`` / ``models.layer.LayerConfig``
"""
from __future__ import annotations

import inspect
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# scatter with torch_scatter / torch_geometric.utils semantics

def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    assert dim == 0, "stub supports dim=0 (all reference call sites)"
    if reduce in ("sum", "add"):
        if out is None:
            size = (dim_size,) + tuple(src.shape[1:])
            out = src.new_zeros(size)
        idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        out.scatter_add_(0, idx, src)
        return out
    if reduce == "mul":
        size = (dim_size,) + tuple(src.shape[1:])
        out = src.new_ones(size)
        idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        out.scatter_reduce_(0, idx, src, reduce="prod", include_self=True)
        return out
    if reduce in ("max", "min"):
        size = (dim_size,) + tuple(src.shape[1:])
        out = src.new_zeros(size)
        idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        out.scatter_reduce_(0, idx, src, reduce="amax" if reduce == "max"
                            else "amin", include_self=False)
        return out
    if reduce == "mean":
        s = scatter(src, index, 0, None, dim_size, "sum")
        cnt = scatter(torch.ones_like(src), index, 0, None, dim_size, "sum")
        return s / cnt.clamp(min=1)
    raise NotImplementedError(reduce)


def degree(index, num_nodes=None, dtype=None):
    n = int(index.max()) + 1 if num_nodes is None else num_nodes
    out = torch.zeros(n, dtype=dtype or torch.long)
    out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))
    return out


def remove_self_loops(edge_index, edge_attr=None):
    keep = edge_index[0] != edge_index[1]
    ei = edge_index[:, keep]
    return ei, (edge_attr[keep] if edge_attr is not None else None)


def to_dense_batch(x, batch=None, fill_value=0.0):
    """PyG to_dense_batch: (N, d) + graph ids → (B, Nmax, d) + real mask."""
    if batch is None:
        return x.unsqueeze(0), torch.ones(1, x.shape[0], dtype=torch.bool)
    B = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=B)
    nmax = int(counts.max())
    out = x.new_full((B, nmax) + tuple(x.shape[1:]), fill_value)
    mask = torch.zeros(B, nmax, dtype=torch.bool)
    pos = torch.cat([torch.arange(int(c)) for c in counts])
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


# --------------------------------------------------------------------------
# MessagePassing with _i/_j suffix resolution

class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=0,
                 **kwargs):
        super().__init__()
        self.aggr = aggr

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]  # _j, _i

        def resolve(name):
            if name == "index":
                return dst
            if name.endswith("_i"):
                v = kwargs[name[:-2]]
                return None if v is None else v[dst]
            if name.endswith("_j"):
                v = kwargs[name[:-2]]
                v = v[0] if isinstance(v, tuple) else v
                return None if v is None else v[src]
            v = kwargs[name]
            return v[1] if isinstance(v, tuple) else v

        def call(fn, first=None):
            params = list(inspect.signature(fn).parameters)
            args = []
            for i, name in enumerate(params):
                if first is not None and i == 0:
                    args.append(first)
                    continue
                args.append(resolve(name))
            return fn(*args)

        msg = call(self.message)
        # node count for the output
        n = None
        for v in kwargs.values():
            t = v[0] if isinstance(v, tuple) else v
            if torch.is_tensor(t) and t.dim() >= 1 and not t.shape[0] == src.shape[0]:
                n = t.shape[0]
                break
        if self.__class__.aggregate is not MessagePassing.aggregate:
            agg = call(self.aggregate, first=msg)
        else:
            agg = scatter(msg, dst, 0, None, n, reduce=self.aggr)
        if self.__class__.update is not MessagePassing.update:
            return call(self.update, first=agg)
        return agg

    def message(self, x_j):  # pragma: no cover - always overridden
        return x_j

    def aggregate(self, msg, index):  # replaced via class-identity check
        raise NotImplementedError

    def update(self, agg):  # replaced via class-identity check
        raise NotImplementedError


def _reset(m):
    if hasattr(m, "reset_parameters"):
        m.reset_parameters()
    for c in getattr(m, "children", lambda: [])():
        _reset(c)


class _CfgNode(dict):
    """yacs-like attribute dict for the graphgym global cfg stub."""

    def __getattr__(self, k):
        if k not in self:
            self[k] = _CfgNode()
        return self[k]

    def __setattr__(self, k, v):
        self[k] = v


def install_stubs():
    """Install sys.modules stubs and put /root/reference on sys.path.
    Returns the graphgym cfg stub so callers can populate posenc groups."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # Synthetic parent packages: the real graphgps/__init__.py imports the
    # whole repo (acts, encoders, networks, ...) which needs far more of PyG
    # than these stubs provide. Registering package shells with __path__ lets
    # `import graphgps.layer.gatedgcn_layer` load ONLY that file.
    import os
    for name in ("graphgps", "graphgps.layer", "graphgps.encoder",
                 "graphgps.loader", "graphgps.loader.dataset",
                 "graphgps.transform"):
        if name in sys.modules:
            continue
        shell = types.ModuleType(name)
        shell.__path__ = [os.path.join(REFERENCE_ROOT,
                                       name.replace(".", os.sep))]
        sys.modules[name] = shell

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # torch_scatter
    mod("torch_scatter", scatter=scatter)

    # yacs
    yacs = mod("yacs")
    yacs_cfg = mod("yacs.config", CfgNode=_CfgNode)
    yacs.config = yacs_cfg

    # torch_geometric tree
    tg = mod("torch_geometric")
    utils = mod("torch_geometric.utils", scatter=scatter, degree=degree,
                remove_self_loops=remove_self_loops,
                to_dense_batch=to_dense_batch)
    conv = mod("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    inits = mod("torch_geometric.nn.inits", reset=_reset)
    pyg_nn = mod("torch_geometric.nn", Linear=torch.nn.Linear, conv=conv,
                 inits=inits)
    gym_cfg = _CfgNode()
    register = mod(
        "torch_geometric.graphgym.register",
        act_dict={"relu": torch.nn.ReLU, "gelu": torch.nn.GELU},
        register_layer=lambda name: (lambda cls: cls),
        register_node_encoder=lambda name: (lambda cls: cls),
        register_edge_encoder=lambda name: (lambda cls: cls),
        register_network=lambda name: (lambda cls: cls),
    )
    config = mod("torch_geometric.graphgym.config", cfg=gym_cfg)
    layer_mod = mod("torch_geometric.graphgym.models.layer",
                    LayerConfig=type("LayerConfig", (), {}))
    models = mod("torch_geometric.graphgym.models", layer=layer_mod)
    gym = mod("torch_geometric.graphgym", register=register, config=config,
              models=models)
    tg.nn = pyg_nn
    tg.utils = utils
    tg.graphgym = gym
    return gym_cfg
