"""Fixture tests for tools/export_cache.py — the bridge from a PyG/OGB/rdkit
environment to this framework's npz cache layouts (VERDICT r2 next #6).

The exporter's upstream dataset classes are stubbed (no PyG here); what these
tests pin down is the CONTRACT: the files export_cache writes must load
through ``load_dataset`` and train a step, for every converter family
(peptides func/struct, PCQM4Mv2 + split_dict.pt, PCQM4Mv2Contact)."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import graphgps_tpu.data.datasets  # noqa: F401,E402
from graphgps_tpu.config.config import new_cfg  # noqa: E402
from graphgps_tpu.data.datasets.base import load_dataset  # noqa: E402

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "export_cache.py")


def _export_cache_module():
    spec = importlib.util.spec_from_file_location("export_cache", TOOLS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeData:
    """Minimal stand-in for a torch_geometric Data object."""

    def __init__(self, rng, n, contact=False):
        self.x = torch.tensor(rng.integers(0, 9, size=(n, 9)), dtype=torch.long)
        m = 2 * (n - 1)
        ei = np.stack([np.r_[np.arange(n - 1), np.arange(1, n)],
                       np.r_[np.arange(1, n), np.arange(n - 1)]])
        self.edge_index = torch.tensor(ei, dtype=torch.long)
        self.edge_attr = torch.tensor(rng.integers(0, 3, size=(m, 3)),
                                      dtype=torch.long)
        if contact:
            self.y = None
            k = max(1, n // 6)
            pos = rng.integers(0, n, size=(2, k))
            self.edge_index_labeled = torch.tensor(pos, dtype=torch.long)
            self.edge_label = torch.tensor(np.ones(k), dtype=torch.long)
        else:
            self.y = torch.tensor(rng.normal(size=(1, 10)),
                                  dtype=torch.float32)


class _FakeDS:
    def __init__(self, n_graphs=24, contact=False, seed=0, ogb_keys=False):
        rng = np.random.default_rng(seed)
        self._data = [_FakeData(rng, int(rng.integers(6, 14)), contact)
                      for _ in range(n_graphs)]
        self._ogb_keys = ogb_keys

    def __len__(self):
        return len(self._data)

    def __getitem__(self, i):
        return self._data[i]

    def get_idx_split(self, name=None):
        n = len(self._data)
        tr = np.arange(0, n - 8)
        va = np.arange(n - 8, n - 4)
        te = np.arange(n - 4, n)
        if self._ogb_keys:  # official OGB-LSC key names
            return {"train": torch.tensor(tr), "valid": torch.tensor(va),
                    "test-dev": torch.tensor(te)}
        return {"train": torch.tensor(tr), "val": torch.tensor(va),
                "test": torch.tensor(te)}


def _stub_module(monkeypatch, dotted, **attrs):
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        name = ".".join(parts[:i])
        if name not in sys.modules:
            monkeypatch.setitem(sys.modules, name, types.ModuleType(name))
    mod = types.ModuleType(dotted)
    for k, v in attrs.items():
        setattr(mod, k, v)
    monkeypatch.setitem(sys.modules, dotted, mod)


def _one_train_step(cfg, splits):
    import jax

    import graphgps_tpu.train.loop as L
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.driver import infer_dims
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    dim_out = infer_dims(cfg, splits)
    loader = BatchLoader(splits.train, batch_size=4,
                         y_graph_level=cfg.dataset.task == "graph")
    gb = next(iter(loader)).to_graph_batch()
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    step = L.make_steps(cfg, model, tx)[0]
    _, loss, *_ = step(state, gb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("kind,task_type,loss",
                         [("functional", "classification_multilabel",
                           "multilabel_cross_entropy"),
                          ("structural", "regression", "l1")])
def test_peptides_export_roundtrip(tmp_path, monkeypatch, kind, task_type,
                                   loss):
    for name in ("peptides_functional", "peptides_structural"):
        cls = "PeptidesFunctionalDataset" if "functional" in name else \
            "PeptidesStructuralDataset"
        _stub_module(monkeypatch, f"graphgps.loader.dataset.{name}",
                     **{cls: lambda root: _FakeDS()})
    mod = _export_cache_module()
    mod.export_peptides(kind, str(tmp_path), str(tmp_path))
    assert os.path.exists(tmp_path / f"peptides-{kind}.npz")

    cfg = new_cfg()
    cfg.dataset.format = "PyG-Peptides"
    cfg.dataset.name = kind
    cfg.dataset.dir = str(tmp_path)
    cfg.dataset.task_type = task_type
    cfg.model.loss_fun = loss
    cfg.dataset.node_encoder_name = "Atom"
    cfg.dataset.edge_encoder_name = "Bond"
    cfg.dataset.synthetic_fallback = False  # must come from the export
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    splits = load_dataset(cfg)
    assert len(splits.train) == 16 and len(splits.val) == 4
    assert splits.train[0].node_feat.shape[1] == 9
    _one_train_step(cfg, splits)


def test_pcqm4m_export_roundtrip(tmp_path, monkeypatch):
    _stub_module(monkeypatch, "ogb.lsc",
                 PygPCQM4Mv2Dataset=lambda root: _FakeDS(
                     n_graphs=40, seed=1, ogb_keys=True))
    mod = _export_cache_module()
    mod.export_pcqm4m(str(tmp_path), str(tmp_path))
    assert os.path.exists(tmp_path / "pcqm4m-v2" / "processed.npz")
    assert os.path.exists(tmp_path / "pcqm4m-v2" / "split_dict.pt")

    # the loader's 150k custom-valid carve-out needs a real-sized cache;
    # shrink it to fixture scale
    import graphgps_tpu.data.datasets.real as real
    monkeypatch.setattr(real, "PCQM_CUSTOM_VALID", 4)
    cfg = new_cfg()
    cfg.dataset.format = "OGB"
    cfg.dataset.name = "PCQM4Mv2-full"
    cfg.dataset.dir = str(tmp_path)
    cfg.dataset.synthetic_fallback = False
    cfg.dataset.node_encoder_name = "Atom"
    cfg.dataset.edge_encoder_name = "Bond"
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    splits = load_dataset(cfg)
    assert len(splits.train) > 0 and len(splits.val) == 4
    _one_train_step(cfg, splits)


def test_contact_export_roundtrip(tmp_path, monkeypatch):
    _stub_module(monkeypatch, "graphgps.loader.dataset.pcqm4mv2_contact",
                 PygPCQM4Mv2ContactDataset=lambda root, subset: _FakeDS(
                     n_graphs=24, contact=True, seed=2))
    mod = _export_cache_module()
    mod.export_contact(str(tmp_path), str(tmp_path))
    assert os.path.exists(tmp_path / "pcqm4mv2-contact.npz")

    cfg = new_cfg()
    cfg.dataset.format = "OGB"
    cfg.dataset.name = "PCQM4Mv2Contact-shuffle"
    cfg.dataset.dir = str(tmp_path)
    cfg.dataset.task = "edge"
    cfg.dataset.task_type = "classification_binary"
    cfg.model.loss_fun = "cross_entropy"
    cfg.dataset.node_encoder_name = "Atom"
    cfg.dataset.edge_encoder_name = "Bond"
    cfg.dataset.synthetic_fallback = False
    cfg.gnn.head = "inductive_edge"
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    splits = load_dataset(cfg)
    assert len(splits.train) == 16
    g0 = splits.train[0]
    assert "edge_label_index" in g0.extras and "edge_label" in g0.extras
