"""Transductive node-classification tasks (Actor / WebKB / WikipediaNetwork):
one shared graph, geom-gcn split masks, loss/metrics restricted per split
(reference master_loader.py:104-129 + GraphGym mask semantics)."""
import json
import os

import numpy as np
import pytest


def _write_geom_gcn(root, name, stem=None, sparse=False, n=20, n_splits=2):
    stem = stem or name
    d = os.path.join(root, name, "raw")
    os.makedirs(d)
    rng = np.random.default_rng(11)
    with open(os.path.join(d, "out1_node_feature_label.txt"), "w") as f:
        f.write("id\tfeature\tlabel\n")
        for i in range(n):
            if sparse:  # Actor-style one-hot index lists (variable length)
                idxs = sorted(rng.choice(12, size=rng.integers(1, 4),
                                         replace=False).tolist())
                feat = ",".join(map(str, idxs))
            else:
                feat = ",".join(f"{v:.3f}" for v in rng.random(5))
            f.write(f"{i}\t{feat}\t{int(rng.integers(0, 3))}\n")
    with open(os.path.join(d, "out1_graph_edges.txt"), "w") as f:
        f.write("src\tdst\n")
        for i in range(n - 1):
            f.write(f"{i}\t{i + 1}\n")
        f.write(f"0\t{n // 2}\n")
    for si in range(n_splits):
        order = np.random.default_rng(si).permutation(n)
        tr = np.zeros(n, bool); va = np.zeros(n, bool); te = np.zeros(n, bool)
        tr[order[: int(0.6 * n)]] = True
        va[order[int(0.6 * n): int(0.8 * n)]] = True
        te[order[int(0.8 * n):]] = True
        np.savez(os.path.join(d, f"{stem}_split_0.6_0.2_{si}.npz"),
                 train_mask=tr, val_mask=va, test_mask=te)


def test_geom_gcn_reader_dense_and_sparse(tmp_path):
    from graphgps_tpu.data.datasets.io_formats import read_geom_gcn_raw

    _write_geom_gcn(str(tmp_path), "cornell")
    g, masks = read_geom_gcn_raw(str(tmp_path), "cornell", 1)
    assert g.node_feat.shape == (20, 5)
    assert g.y.shape == (20,)
    # undirected + deduped
    pairs = set(map(tuple, g.edge_index.T.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    assert masks["train_mask"].sum() == 12
    assert not (masks["train_mask"] & masks["val_mask"]).any()

    _write_geom_gcn(str(tmp_path), "film", sparse=True)
    g2, _ = read_geom_gcn_raw(str(tmp_path), "Actor", 0)
    assert set(np.unique(g2.node_feat)) <= {0.0, 1.0}  # multi-hot


def test_split_mask_restricts_loss(tmp_path):
    """Train loss only sees train-mask nodes; val metrics only val nodes."""
    import jax

    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.driver import create_loaders, infer_dims
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    import graphgps_tpu.train.loop as L

    _write_geom_gcn(str(tmp_path / "WebKB"), "cornell")
    cfg = new_cfg()
    cfg.dataset.format = "PyG-WebKB"
    cfg.dataset.name = "cornell"
    cfg.dataset.dir = str(tmp_path)
    cfg.dataset.task = "node"
    cfg.dataset.task_type = "classification"
    cfg.dataset.node_encoder_name = "LinearNode"
    cfg.dataset.edge_encoder = False
    cfg.model.loss_fun = "cross_entropy"
    cfg.gnn.head = "node"
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.train.batch_size = 1
    splits = load_dataset(cfg)
    dim_out = infer_dims(cfg, splits)
    loaders = create_loaders(cfg, splits)
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    item = next(iter(loaders["train"]))
    gb = item[1] if isinstance(item, tuple) else item.to_graph_batch()
    state = L.init_state(cfg, model, gb, 0, tx)
    _, _, _, eval_step = L.make_steps(cfg, model, tx)
    _, pred, _, mask = eval_step(state, gb)
    m = np.asarray(mask)
    # only the 12 train-mask nodes are counted
    assert int(m.sum()) == 12

    item_v = next(iter(loaders["val"]))
    gb_v = item_v[1] if isinstance(item_v, tuple) else item_v.to_graph_batch()
    _, _, _, mask_v = eval_step(state, gb_v)
    assert int(np.asarray(mask_v).sum()) == 4


def test_actor_recipe_trains_on_fixture(tmp_path):
    from graphgps_tpu.driver import main

    _write_geom_gcn(str(tmp_path / "Actor"), "film", sparse=True, n=24)
    main(["--cfg", "configs/GPS/actor-GPS.yaml",
          "out_dir", str(tmp_path / "out"),
          "dataset.dir", str(tmp_path),
          "dataset.synthetic_fallback", "False",
          "gt.layers", "1", "gt.dim_hidden", "16", "gt.n_heads", "2",
          "gnn.dim_inner", "16", "posenc_LapPE.dim_pe", "4",
          "train.batch_size", "1", "train.eval_period", "1",
          "optim.max_epoch", "2", "optim.num_warmup_epochs", "1"])
    stats = tmp_path / "out" / "actor-GPS" / "0" / "val" / "stats.json"
    rows = [json.loads(l) for l in stats.read_text().splitlines()]
    assert "accuracy" in rows[-1] and np.isfinite(rows[-1]["loss"])


def test_planetoid_raw(tmp_path):
    """Planetoid ind.* layout: feature/label reconstruction with CiteSeer-style
    test-index gaps and the standard train/500-val/test split."""
    import pickle

    import scipy.sparse as sp

    from graphgps_tpu.data.datasets.io_formats import read_planetoid_raw

    d = os.path.join(str(tmp_path), "cora", "raw")
    os.makedirs(d)
    rng = np.random.default_rng(3)
    n_train, n_val_extra, n_test, F, C = 6, 8, 5, 4, 3
    n_all = n_train + n_val_extra
    allx = sp.csr_matrix(rng.random((n_all, F)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, F)).astype(np.float32))
    onehot = lambda k, n: np.eye(C, dtype=np.int64)[rng.integers(0, C, n)]
    ally, ty, y = onehot(C, n_all), onehot(C, n_test), None
    y = ally[:n_train]
    # test indices with a GAP (isolated node) like CiteSeer
    test_idx = np.array([n_all, n_all + 1, n_all + 3, n_all + 4, n_all + 5])
    graph = {i: [(i + 1) % (n_all + 6)] for i in range(n_all + 6)}
    for part, obj in (("x", allx[:n_train]), ("tx", tx), ("allx", allx),
                      ("y", y), ("ty", ty), ("ally", ally), ("graph", graph)):
        with open(os.path.join(d, f"ind.cora.{part}"), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(d, "ind.cora.test.index"), "w") as f:
        f.write("\n".join(map(str, test_idx)) + "\n")

    g, masks = read_planetoid_raw(str(tmp_path), "Cora")
    assert g.num_nodes == n_all + 6
    # gap node (n_all+2) has zero features and no test mask
    assert np.allclose(g.node_feat[n_all + 2], 0)
    assert not masks["test_mask"][n_all + 2]
    assert masks["test_mask"].sum() == n_test
    assert masks["train_mask"].sum() == n_train
    # test rows landed at their true indices
    np.testing.assert_allclose(g.node_feat[test_idx],
                               np.asarray(tx.todense()), rtol=1e-6)
    assert int(g.y[test_idx[0]]) == int(ty[0].argmax())
