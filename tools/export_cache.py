#!/usr/bin/env python3
"""Export npz caches for the rdkit-dependent datasets from a PyG/OGB env.

The peptides / PCQM4Mv2 / PCQM4Mv2Contact graphs are built from SMILES with
rdkit at load time upstream (reference peptides_functional.py:15-134,
pcqm4mv2_contact.py:263-540) — a host-side preprocessing dependency this
framework deliberately keeps OUT of the training path (SURVEY §2.9). Run this
script once in an environment with torch_geometric + ogb + rdkit installed;
it writes the npz layouts graphgps_tpu's loaders consume:

    python tools/export_cache.py peptides-functional --root <pyg-root> --out <dataset.dir>
    python tools/export_cache.py peptides-structural ...
    python tools/export_cache.py pcqm4m-v2 ...
    python tools/export_cache.py pcqm4mv2-contact ...

Every other dataset family (ZINC, OGB mol/ppa/code2, GNNBenchmark, LRGB
superpixels, AQSOL, MalNet, TUDataset) is parsed from its GENUINE raw files
directly (graphgps_tpu/data/datasets/io_formats.py) — no conversion needed.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _rec(data) -> dict:
    rec = dict(x=data.x.numpy(), edge_index=data.edge_index.numpy())
    if getattr(data, "edge_attr", None) is not None:
        rec["edge_attr"] = data.edge_attr.numpy()
    if getattr(data, "y", None) is not None:
        rec["y"] = np.asarray(data.y).reshape(-1)
    for key in ("edge_index_labeled", "edge_label"):
        v = getattr(data, key, None)
        if v is not None:
            out_key = "edge_label_index" if key == "edge_index_labeled" else key
            rec[out_key] = np.asarray(v)
    return rec


def export_peptides(kind: str, root: str, out: str) -> None:
    if kind == "functional":
        from graphgps.loader.dataset.peptides_functional import \
            PeptidesFunctionalDataset as DS
    else:
        from graphgps.loader.dataset.peptides_structural import \
            PeptidesStructuralDataset as DS
    ds = DS(root)
    split = ds.get_idx_split()
    recs = [_rec(ds[i]) for i in range(len(ds))]
    splits = {name: [recs[int(i)] for i in idx]
              for name, idx in (("train", split["train"]),
                                ("val", split["val"]),
                                ("test", split["test"]))}
    np.savez_compressed(
        os.path.join(out, f"peptides-{kind}.npz"),
        train=np.array(splits["train"], dtype=object),
        val=np.array(splits["val"], dtype=object),
        test=np.array(splits["test"], dtype=object))


def export_pcqm4m(root: str, out: str) -> None:
    from ogb.lsc import PygPCQM4Mv2Dataset

    ds = PygPCQM4Mv2Dataset(root=root)
    recs = np.array([_rec(ds[i]) for i in range(len(ds))], dtype=object)
    d = os.path.join(out, "pcqm4m-v2")
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, "processed.npz"), graphs=recs,
             split=np.array({}, dtype=object))
    # the official split_dict.pt is consumed directly — copy it alongside
    import shutil
    import torch

    torch.save({k: np.asarray(v) for k, v in ds.get_idx_split().items()},
               os.path.join(d, "split_dict.pt"))
    del shutil


def export_contact(root: str, out: str) -> None:
    from graphgps.loader.dataset.pcqm4mv2_contact import \
        PygPCQM4Mv2ContactDataset

    ds = PygPCQM4Mv2ContactDataset(root, subset="530k")
    recs = np.array([_rec(ds[i]) for i in range(len(ds))], dtype=object)
    kw = dict(graphs=recs)
    for split_name in ("shuffle", "num-atoms"):
        s = ds.get_idx_split(split_name)
        kw[f"split_{split_name.replace('-', '_')}"] = np.array(
            {k: np.asarray(v) for k, v in s.items()}, dtype=object)
    np.savez(os.path.join(out, "pcqm4mv2-contact.npz"), **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["peptides-functional",
                                        "peptides-structural", "pcqm4m-v2",
                                        "pcqm4mv2-contact"])
    ap.add_argument("--root", required=True, help="PyG download/cache root")
    ap.add_argument("--out", required=True, help="graphgps_tpu dataset.dir")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.dataset.startswith("peptides"):
        export_peptides(args.dataset.split("-", 1)[1], args.root, args.out)
    elif args.dataset == "pcqm4m-v2":
        export_pcqm4m(args.root, args.out)
    else:
        export_contact(args.root, args.out)
    print("exported", args.dataset, "→", args.out)


if __name__ == "__main__":
    main()
