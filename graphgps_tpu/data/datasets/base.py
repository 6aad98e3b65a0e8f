"""Dataset containers + master loader dispatch.

Capability analog of the reference's master loader
(/root/reference/graphgps/loader/master_loader.py:82-233): a single entry point
``load_dataset(cfg)`` dispatches on ``dataset.format``/``dataset.name``, applies
task preprocessing + PE precompute, and returns train/val/test Graph lists.

No-egress note: real datasets (ZINC, OGB, LRGB…) are read from a local cache dir
when present; otherwise loaders raise with a clear message and callers may use the
``synthetic`` format which generates statistically-matched graphs deterministically.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ...registry import dataset_dict, register_dataset
from ..graph import Graph


@dataclasses.dataclass
class DatasetSplits:
    train: List[Graph]
    val: List[Graph]
    test: List[Graph]
    meta: Dict = dataclasses.field(default_factory=dict)

    @property
    def all_graphs(self) -> List[Graph]:
        return self.train + self.val + self.test


def load_dataset(cfg) -> DatasetSplits:
    fmt, name = cfg.dataset.format, cfg.dataset.name
    # most-specific first: "<format>-<name>" beats the generic format loader
    key = f"{fmt}-{name}" if f"{fmt}-{name}" in dataset_dict else fmt
    if key not in dataset_dict:
        raise ValueError(f"no dataset loader for format={fmt!r} name={name!r};"
                         f" registered: {sorted(dataset_dict)}")
    splits: DatasetSplits = dataset_dict[key](cfg)

    # task-specific preprocessing (reference task_preprocessing.py:9-65)
    from ..transforms import task_specific_preprocessing
    for g in splits.all_graphs:
        task_specific_preprocessing(g, cfg)

    # split regeneration (reference split_generator.py:11-31)
    if cfg.dataset.split_mode != "standard":
        from ..splits import prepare_splits
        splits = prepare_splits(splits, cfg)

    # PE precompute (reference master_loader.py:206-216)
    from ...pe.host import compute_posenc
    compute_posenc(splits.all_graphs, cfg)

    # PNA degree histogram over the train split (reference master_loader.py:236-254)
    if "PNA" in cfg.gt.layer_type or cfg.gnn.layer_type == "pnaconv":
        if not cfg.gt.pna_degrees:
            cfg.gt.pna_degrees = compute_indegree_histogram(splits.train)
    return splits


def compute_indegree_histogram(graphs: List[Graph]) -> List[int]:
    max_deg = 0
    counts = np.zeros(512, dtype=np.int64)
    for g in graphs:
        deg = np.zeros(g.num_nodes, dtype=np.int64)
        np.add.at(deg, g.edge_index[1], 1)
        if deg.size:
            max_deg = max(max_deg, int(deg.max()))
            counts[:deg.max() + 1] += np.bincount(deg, minlength=int(deg.max()) + 1)
    return counts[:max_deg + 1].tolist()
