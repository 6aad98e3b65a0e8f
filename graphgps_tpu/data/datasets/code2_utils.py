"""ogbg-code2 utilities: vocab building, AST edge augmentation, target encoding.

Capability parity with /root/reference/graphgps/loader/ogbg_code2_utils.py:11-67+:
- ``get_vocab_mapping``: top-`num_vocab` frequent subtokens from the train split
  + UNK + EOS sentinel ids;
- ``augment_edge``: AST edges (typed, with inverse) + next-token chain edges
  (+ inverses), giving edge_feat[:, 0] = type (0 AST / 1 next-token),
  edge_feat[:, 1] = direction (0 forward / 1 inverse);
- ``encode_y_to_arr`` / ``decode_arr_to_seq``: variable-length subtoken targets
  to fixed (max_seq_len,) int arrays and back.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..graph import Graph


def get_vocab_mapping(seq_list: Sequence[Sequence[str]],
                      num_vocab: int = 5000) -> Tuple[Dict[str, int], List[str]]:
    """vocab2idx with UNK=num_vocab, EOS=num_vocab+1 (reference :11-67)."""
    counter: Counter = Counter()
    for seq in seq_list:
        counter.update(seq)
    topk = [tok for tok, _ in counter.most_common(num_vocab)]
    vocab2idx = {tok: i for i, tok in enumerate(topk)}
    # UNK/EOS ids follow the real vocab (== num_vocab, num_vocab+1 when the
    # corpus fills the budget, matching the reference's own asserts that
    # idx2vocab[i] ↔ vocab2idx stay consistent and EOS is last)
    vocab2idx["__UNK__"] = len(topk)
    vocab2idx["__EOS__"] = len(topk) + 1
    idx2vocab = topk + ["__UNK__", "__EOS__"]
    return vocab2idx, idx2vocab


def augment_edge(g: Graph) -> Graph:
    """Add inverse AST edges + bidirectional next-token chain edges with
    (type, direction) edge attributes (reference augment_edge,
    ogbg_code2_utils.py:70-130). Next-token edges connect *attributed* nodes
    in DFS order when ``g.extras['node_is_attributed']`` is present (nodes are
    already DFS-sorted in OGB's ASTs); otherwise the plain node ordering."""
    s, r = g.edge_index
    n = g.num_nodes
    # AST forward + inverse
    ast_f = np.stack([s, r])
    ast_b = np.stack([r, s])
    attributed = g.extras.pop("node_is_attributed", None)
    if attributed is not None:
        chain = np.nonzero(np.asarray(attributed).ravel() == 1)[0]
    else:
        chain = np.arange(n)
    nt_f = np.stack([chain[:-1], chain[1:]])
    nt_b = np.stack([chain[1:], chain[:-1]])
    ei = np.concatenate([ast_f, ast_b, nt_f, nt_b], axis=1)
    attr = np.concatenate([
        np.tile([[0, 0]], (ast_f.shape[1], 1)),
        np.tile([[0, 1]], (ast_b.shape[1], 1)),
        np.tile([[1, 0]], (nt_f.shape[1], 1)),
        np.tile([[1, 1]], (nt_b.shape[1], 1)),
    ], axis=0).astype(np.int64)
    g.edge_index = ei
    g.edge_feat = attr
    return g


def encode_y_to_arr(seq: Sequence[str], vocab2idx: Dict[str, int],
                    max_seq_len: int = 5) -> np.ndarray:
    unk = vocab2idx["__UNK__"]
    eos = vocab2idx["__EOS__"]
    out = np.full((max_seq_len,), eos, dtype=np.int64)
    for i, tok in enumerate(seq[:max_seq_len]):
        out[i] = vocab2idx.get(tok, unk)
    return out


def decode_arr_to_seq(arr: np.ndarray, idx2vocab: List[str]) -> List[str]:
    eos = len(idx2vocab) - 1
    out = []
    for i in arr.tolist():
        if i == eos:
            break
        out.append(idx2vocab[i])
    return out
