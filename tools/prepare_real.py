#!/usr/bin/env python3
"""Real-data readiness, end to end (VERDICT r3 #9).

Given a directory of UPSTREAM raw dataset files (the exact bytes the
reference's PyG/OGB loaders download — see each reader in
graphgps_tpu/data/datasets/io_formats.py for the expected layout, and
tools/export_cache.py for the three rdkit-built npz caches), this command:

 1. probes which datasets are present,
 2. loads each through its REAL recipe config with synthetic_fallback=False
    (a format mismatch is a loud error, never a silent synthetic substitute),
 3. validates split sizes / feature shapes / label presence and prints a
    content checksum per split,
 4. emits the runbook: the exact training commands for the north-star
    accuracy gates and the reference numbers they must match.

Usage:
    python tools/prepare_real.py /path/to/datasets          # validate + runbook
    python tools/prepare_real.py --selftest                 # fixture dry-run

--selftest fabricates the miniature fixture layouts the format tests use
(tests/test_real_formats.py writers — the same raw byte layouts, tiny) into
a temp dir and runs the identical probe/validate/runbook path, so the whole
pipeline is exercised without network egress. The moment real files exist,
the north-star runs are a copy-paste.

Reference anchors: /root/reference/README.md:40-79 (run instructions and
target numbers), reference main.py --cfg dispatch.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, recipe yaml, probe paths relative to dataset dir — ANY hit counts)
DATASETS = [
    ("ZINC-subset", "configs/GPS/zinc-GPS+RWSE.yaml",
     ["ZINC/raw/train.pickle"]),
    ("PCQM4Mv2", "configs/GPS/pcqm4m-GPSdeep+RWSE.yaml",
     ["pcqm4m-v2/raw/data.csv.gz", "pcqm4m-v2/processed.npz",
      "pcqm4m-v2/processed/graphs.npz"]),
    ("Peptides-functional", "configs/GPS/peptides-func-GPS.yaml",
     ["peptides-functional/raw/peptide_multi_class_dataset.csv.gz",
      "peptides-functional/processed.npz"]),
    ("Peptides-structural", "configs/GPS/peptides-struct-GPS.yaml",
     ["peptides-structural/raw/peptide_structure_normalized_dataset.csv.gz",
      "peptides-structural/processed.npz"]),
    ("VOCSuperpixels", "configs/GPS/vocsuperpixels-GPS.yaml",
     ["VOCSuperpixels/slic_compactness_10/edge_wt_only_coord/raw/"
      "train.pickle",
      "VOCSuperpixels/slic_compactness_30/edge_wt_only_coord/raw/"
      "train.pickle"]),
    ("COCOSuperpixels", "configs/GPS/cocosuperpixels-GPS.yaml",
     ["COCOSuperpixels/slic_compactness_30/edge_wt_region_boundary/raw/"
      "train.pickle",
      "COCOSuperpixels/slic_compactness_10/edge_wt_region_boundary/raw/"
      "train.pickle"]),
    ("ogbg-molhiv", "configs/GPS/ogbg-molhiv-GPS+RWSE.yaml",
     ["ogbg_molhiv/raw/edge.csv.gz"]),
    ("ogbg-molpcba", "configs/GPS/ogbg-molpcba-GPS+RWSE.yaml",
     ["ogbg_molpcba/raw/edge.csv.gz"]),
    ("ogbg-ppa", "configs/GPS/ogbg-ppa-GPS.yaml",
     ["ogbg_ppa/raw/edge.csv.gz"]),
    ("ogbg-code2", "configs/GPS/ogbg-code2-GPS.yaml",
     ["ogbg_code2/raw/edge.csv.gz"]),
    ("PATTERN", "configs/GPS/pattern-GPS.yaml",
     ["GNNBenchmarkDataset/PATTERN/raw/PATTERN.pt", "PATTERN/raw/PATTERN.pt"]),
    ("CLUSTER", "configs/GPS/cluster-GPS.yaml",
     ["GNNBenchmarkDataset/CLUSTER/raw/CLUSTER.pt", "CLUSTER/raw/CLUSTER.pt"]),
    ("MNIST", "configs/GPS/mnist-GPS.yaml",
     ["GNNBenchmarkDataset/MNIST/raw/MNIST.pt", "MNIST/raw/MNIST.pt"]),
    ("CIFAR10", "configs/GPS/cifar10-GPS+RWSE.yaml",
     ["GNNBenchmarkDataset/CIFAR10/raw/CIFAR10.pt", "CIFAR10/raw/CIFAR10.pt"]),
    ("AQSOL", "configs/GatedGCN/aqsol-GatedGCN.yaml",
     ["AQSOL/raw/train.pickle"]),
    ("MalNetTiny", "configs/GPS/malnettiny-GPS.yaml",
     ["malnet-graphs-tiny", "MalNetTiny/raw"]),
]

# the two north-star accuracy gates (reference README.md:75-79)
GATES = """
================== NORTH-STAR ACCURACY GATES (runbook) ==================
1) ZINC-subset — target test MAE ~= 0.070 (reference README.md:75,
   zinc-GPS+RWSE.yaml, 10 seeds):
     python main.py --cfg configs/GPS/zinc-GPS+RWSE.yaml --repeat 10 \\
         dataset.dir {d} dataset.synthetic_fallback False \\
         train.parallel_seeds True
2) PCQM4Mv2 — target valid MAE ~= 0.0862 (reference README.md:78,
   pcqm4m-GPSmedium+RWSE.yaml; GPS-deep ~0.0852):
     python main.py --cfg configs/GPS/pcqm4m-GPSmedium+RWSE.yaml \\
         dataset.dir {d} dataset.synthetic_fallback False
   (~13,000 graphs/s/chip at the GPS-deep shape -> ~=10.3h for 150 epochs
    of the 3.23M-graph train split on ONE v5e chip vs ~60h on A100.)
Aggregate results land in <out_dir>/agg; per-seed best in agg/val/best.json.
=========================================================================
"""


def _checksum(graphs, k=5):
    h = hashlib.sha256()
    for g in graphs[:k]:
        h.update(np.ascontiguousarray(g.node_feat).tobytes())
        h.update(np.ascontiguousarray(g.edge_index).tobytes())
    return h.hexdigest()[:12]


def validate(label: str, recipe: str, data_dir: str):
    """Load through the real recipe config; return per-split summary."""
    from graphgps_tpu.config.config import load_cfg, new_cfg
    import graphgps_tpu.data.datasets  # noqa: F401  (registers loaders)
    from graphgps_tpu.data.datasets.base import load_dataset

    cfg = load_cfg(new_cfg(), recipe)
    cfg.dataset.dir = data_dir
    cfg.dataset.synthetic_fallback = False
    splits = load_dataset(cfg)
    out = {}
    for sp in ("train", "val", "test"):
        graphs = getattr(splits, sp, None)
        if not graphs:
            continue
        g0 = graphs[0]
        ys = [g.y for g in graphs[:50] if g.y is not None]
        out[sp] = dict(
            graphs=len(graphs),
            node_feat_dim=(int(np.atleast_2d(g0.node_feat).shape[-1])
                           if g0.node_feat is not None else 0),
            edge_feat_dim=(int(np.atleast_2d(g0.edge_feat).shape[-1])
                           if g0.edge_feat is not None else 0),
            has_labels=bool(ys),
            checksum=_checksum(graphs),
        )
        # shape sanity: every sampled graph's endpoints in range
        for g in graphs[:20]:
            if g.num_edges:
                assert int(g.edge_index.max()) < g.num_nodes, \
                    f"{label}/{sp}: edge endpoint out of range"
    assert out, f"{label}: loader produced no splits"
    return out


def run(data_dir: str) -> int:
    found, missing, failed = [], [], []
    for label, recipe, probes in DATASETS:
        if not os.path.exists(recipe):
            continue
        if not any(os.path.exists(os.path.join(data_dir, p)) for p in probes):
            missing.append(label)
            continue
        try:
            summary = validate(label, recipe, data_dir)
        except Exception as e:  # loud per-dataset, keep going
            failed.append((label, str(e)[:200]))
            print(f"[FAIL] {label}: {e}")
            continue
        found.append(label)
        rows = ", ".join(f"{sp}={v['graphs']}g"
                         f"(x{v['node_feat_dim']}/e{v['edge_feat_dim']},"
                         f"{v['checksum']})" for sp, v in summary.items())
        print(f"[ok]   {label}: {rows}")
    for label in missing:
        print(f"[--]   {label}: raw files not present")
    print(f"\n{len(found)} dataset(s) validated, {len(missing)} absent, "
          f"{len(failed)} failed")
    print(GATES.format(d=data_dir))
    return 1 if failed else 0


def selftest() -> int:
    """Fabricate the fixture raw layouts (the format tests' writers) into a
    temp dir and run the SAME probe/validate/runbook path."""
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import test_real_formats as F

    d = tempfile.mkdtemp(prefix="ggps_prepare_real_")
    F._write_zinc_raw(d)
    F._write_ogb_raw(os.path.join(d, "ogbg_molhiv"))
    F._write_gnnbench_pt(d, "PATTERN", node_level=True)
    # compactness/variant as each recipe requests (VOC: default 10 +
    # edge_wt_only_coord; COCO: 30 + edge_wt_region_boundary + remap labels)
    from graphgps_tpu.data.datasets.io_formats import COCO_ORIGINAL_LABELS
    F._write_lrgb(d, "VOCSuperpixels", compactness=10)
    F._write_lrgb(d, "COCOSuperpixels", compactness=30,
                  variant="edge_wt_region_boundary",
                  labels=np.array(COCO_ORIGINAL_LABELS))
    F._write_pcqm(d)
    # fixture-scale split constants (the real ones carve 150k custom-valid
    # graphs; the fixture has 30)
    import graphgps_tpu.data.datasets.real as real
    real.PCQM_CUSTOM_VALID = 10
    real.PCQM_SUBSET_VALID = 5
    F._write_peptides_raw(d, "functional")
    F._write_peptides_raw(d, "structural")
    print(f"fixture layouts written under {d}\n")
    return run(d)   # non-zero on any [FAIL]; tests/test_prepare_real.py
    # additionally asserts each fabricated dataset printed [ok]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_dir", nargs="?", help="upstream raw dataset root")
    ap.add_argument("--selftest", action="store_true",
                    help="run against fabricated fixture layouts")
    args = ap.parse_args()
    if args.selftest:
        sys.exit(selftest())
    if not args.data_dir:
        ap.error("data_dir required (or --selftest)")
    sys.exit(run(args.data_dir))


if __name__ == "__main__":
    main()
