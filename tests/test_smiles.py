"""Pure-Python smiles_to_graph vs hand-derived OGB feature vectors.

Every expected vector below was derived by hand from the OGB
``atom_to_feature_vector`` / ``bond_to_feature_vector`` index scheme
(ogb.utils.features; cardinalities [119,4,12,12,10,6,6,2,2] / [5,6,2]) and
the rdkit conventions documented in graphgps_tpu/data/datasets/smiles.py.
Atom feature order: [atomic_num, chirality, total_degree, formal_charge,
num_hs, radicals, hybridization, aromatic, in_ring]; bond feature order:
[bond_type, stereo, conjugated].
"""
import numpy as np
import pytest

from graphgps_tpu.data.datasets.smiles import (SmilesError, parse_smiles,
                                               smiles_to_graph)


def check(smiles, exp_x, exp_bonds=None, exp_bond_feats=None):
    g = smiles_to_graph(smiles)
    np.testing.assert_array_equal(
        g["node_feat"], np.asarray(exp_x, np.int64), err_msg=smiles)
    assert g["num_nodes"] == len(exp_x)
    if exp_bonds is not None:
        pairs = [(int(g["edge_index"][0, 2 * k]),
                  int(g["edge_index"][1, 2 * k]))
                 for k in range(g["edge_index"].shape[1] // 2)]
        assert pairs == exp_bonds, smiles
        # reverse directions interleaved, features duplicated per direction
        np.testing.assert_array_equal(g["edge_index"][0, 1::2],
                                      g["edge_index"][1, ::2])
        np.testing.assert_array_equal(g["edge_index"][1, 1::2],
                                      g["edge_index"][0, ::2])
    if exp_bond_feats is not None:
        np.testing.assert_array_equal(
            g["edge_feat"][::2], np.asarray(exp_bond_feats, np.int64),
            err_msg=smiles)
        np.testing.assert_array_equal(g["edge_feat"][::2],
                                      g["edge_feat"][1::2])


def test_ethanol():
    check("CCO",
          [[5, 0, 4, 5, 3, 0, 2, 0, 0],
           [5, 0, 4, 5, 2, 0, 2, 0, 0],
           [7, 0, 2, 5, 1, 0, 2, 0, 0]],
          [(0, 1), (1, 2)],
          [[0, 0, 0], [0, 0, 0]])


def test_acetic_acid_conjugation():
    check("CC(=O)O",
          [[5, 0, 4, 5, 3, 0, 2, 0, 0],
           [5, 0, 3, 5, 0, 0, 1, 0, 0],    # carboxyl C: SP2
           [7, 0, 1, 5, 0, 0, 1, 0, 0],    # =O: SP2
           [7, 0, 2, 5, 1, 0, 2, 0, 0]],   # -OH: SP3
          [(0, 1), (1, 2), (1, 3)],
          [[0, 0, 0], [1, 0, 1], [0, 0, 1]])   # C=O and C-O conjugated


def test_benzene_aromatic_and_kekule():
    c = [5, 0, 3, 5, 1, 0, 1, 1, 1]
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]
    arom = [[3, 0, 1]] * 6
    check("c1ccccc1", [c] * 6, bonds, arom)
    # Kekulé input must perceive identically (rdkit sanitization parity)
    check("C1=CC=CC=C1", [c] * 6, bonds, arom)


def test_pyridine():
    c = [5, 0, 3, 5, 1, 0, 1, 1, 1]
    n = [6, 0, 2, 5, 0, 0, 1, 1, 1]       # 0 Hs, SP2
    check("c1ccncc1", [c, c, c, n, c, c])


def test_pyrrole_and_imidazole():
    c = [5, 0, 3, 5, 1, 0, 1, 1, 1]
    nh = [6, 0, 3, 5, 1, 0, 1, 1, 1]      # [nH]: 1 H, SP2 (aromatic override)
    check("c1cc[nH]c1", [c, c, c, nh, c])
    n = [6, 0, 2, 5, 0, 0, 1, 1, 1]
    check("c1cnc[nH]1", [c, c, n, c, nh])


def test_alanine_chirality_cw():
    # N[C@@H](C)C(=O)O: text order [N,H,C,C'] vs storage [N,C,C',H] is an
    # even permutation → tag stays @@ → CHI_TETRAHEDRAL_CW (index 1)
    check("N[C@@H](C)C(=O)O",
          [[6, 0, 3, 5, 2, 0, 2, 0, 0],
           [5, 1, 4, 5, 1, 0, 2, 0, 0],
           [5, 0, 4, 5, 3, 0, 2, 0, 0],
           [5, 0, 3, 5, 0, 0, 1, 0, 0],
           [7, 0, 1, 5, 0, 0, 1, 0, 0],
           [7, 0, 2, 5, 1, 0, 2, 0, 0]],
          [(0, 1), (1, 2), (1, 3), (3, 4), (3, 5)],
          [[0, 0, 0], [0, 0, 0], [0, 0, 0], [1, 0, 1], [0, 0, 1]])
    # swapping the branch order and the tag denotes the same stereocenter
    ccw = smiles_to_graph("N[C@H](C)C(=O)O")["node_feat"][1, 1]
    assert ccw == 2


def test_proline_ring_closure_chirality():
    # OC(=O)[C@@H]1CCCN1: the ring-closure partner sits at the digit's text
    # position but its bond is created last → odd parity → tag flips to
    # CCW (index 2). Exercises rdkit's AdjustAtomChiralityFlags semantics.
    ch2 = [5, 0, 4, 5, 2, 0, 2, 0, 1]
    check("OC(=O)[C@@H]1CCCN1",
          [[7, 0, 2, 5, 1, 0, 2, 0, 0],
           [5, 0, 3, 5, 0, 0, 1, 0, 0],
           [7, 0, 1, 5, 0, 0, 1, 0, 0],
           [5, 2, 4, 5, 1, 0, 2, 0, 1],
           ch2, ch2, ch2,
           [6, 0, 3, 5, 1, 0, 2, 0, 1]],
          [(0, 1), (1, 2), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (3, 7)])


def test_glycinate_formal_charge():
    check("NCC(=O)[O-]",
          [[6, 0, 3, 5, 2, 0, 2, 0, 0],
           [5, 0, 4, 5, 2, 0, 2, 0, 0],
           [5, 0, 3, 5, 0, 0, 1, 0, 0],
           [7, 0, 1, 5, 0, 0, 1, 0, 0],
           [7, 0, 1, 4, 0, 0, 2, 0, 0]],  # O-: charge index 4, SP3 (3 LPs)
          [(0, 1), (1, 2), (2, 3), (2, 4)],
          [[0, 0, 0], [0, 0, 0], [1, 0, 1], [0, 0, 1]])


def test_guanidinium():
    check("NC(=[NH2+])N",
          [[6, 0, 3, 5, 2, 0, 2, 0, 0],
           [5, 0, 3, 5, 0, 0, 1, 0, 0],
           [6, 0, 3, 6, 2, 0, 1, 0, 0],   # [NH2+]: charge +1, SP2, 0 radicals
           [6, 0, 3, 5, 2, 0, 2, 0, 0]],
          [(0, 1), (1, 2), (1, 3)],
          [[0, 0, 1], [1, 0, 1], [0, 0, 1]])   # fully conjugated


def test_butene_stereo():
    e = smiles_to_graph("C/C=C/C")["edge_feat"]
    assert e[2].tolist() == [1, 2, 0]     # double bond, STEREOE, unconjugated
    z = smiles_to_graph("C/C=C\\C")["edge_feat"]
    assert z[2].tolist() == [1, 1, 0]     # STEREOZ
    branch = smiles_to_graph("C(/F)=C/F")["edge_feat"]
    assert branch[0].tolist()[1] == 0     # C-F single: STEREONONE
    assert branch[2].tolist() == [1, 1, 0]  # same side → Z (≡ F\C=C/F)


def test_toluene_phenol_conjugation_boundary():
    tol = smiles_to_graph("Cc1ccccc1")["edge_feat"]
    assert tol[0].tolist() == [0, 0, 0]   # CH3-c: sp3 partner, unconjugated
    phe = smiles_to_graph("Oc1ccccc1")["edge_feat"]
    assert phe[0].tolist() == [0, 0, 1]   # HO-c: lone-pair donor, conjugated


def test_disconnected_salt():
    g = smiles_to_graph("[Na+].[Cl-]")
    np.testing.assert_array_equal(
        g["node_feat"],
        [[10, 0, 0, 6, 0, 0, 5, 0, 0],    # Na+: hybridization misc
         [16, 0, 0, 4, 0, 0, 2, 0, 0]])   # Cl-: 4 lone pairs → SP3
    assert g["edge_index"].shape == (2, 0)
    assert g["edge_feat"].shape == (0, 3)


def test_methyl_radical():
    g = smiles_to_graph("[CH3]")
    assert g["node_feat"][0].tolist() == [5, 0, 3, 5, 3, 1, 2, 0, 0]


def test_indole_fused_kekulization():
    g = smiles_to_graph("c1ccc2c(c1)cc[nH]2")
    x = g["node_feat"]
    assert all(x[:, 7] == 1) and all(x[:, 8] == 1)   # all aromatic, in ring
    n = x[np.asarray(x[:, 0] == 6).nonzero()[0][0]]
    assert n.tolist() == [6, 0, 3, 5, 1, 0, 1, 1, 1]
    # every ring bond aromatic
    assert all(f[0] == 3 for f in g["edge_feat"].tolist())


def test_ring_membership_vs_bridge():
    g = smiles_to_graph("C1CC1CC")      # cyclopropane + ethyl tail
    assert g["node_feat"][:, 8].tolist() == [1, 1, 1, 0, 0]


def test_triple_bond_and_sp():
    g = smiles_to_graph("CC#N")
    x = g["node_feat"]
    assert x[1].tolist() == [5, 0, 2, 5, 0, 0, 0, 0, 0]   # sp C
    assert x[2].tolist() == [6, 0, 1, 5, 0, 0, 0, 0, 0]   # nitrile N: sp
    assert g["edge_feat"][2].tolist() == [2, 0, 0]        # TRIPLE


def test_percent_ring_and_errors():
    g = smiles_to_graph("C%10CCCCC%10")
    assert g["node_feat"][:, 8].tolist() == [1] * 6
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")            # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("C((C)")           # unbalanced parens
    with pytest.raises(SmilesError):
        parse_smiles("C=#C")            # double bond symbol


def test_peptide_scale_smoke():
    # a di-peptide (Ala-Phe) SMILES in rdkit-canonical form parses with
    # sensible stats: amide bonds conjugated, ring flagged, chiral tags set
    s = "C[C@H](N)C(=O)N[C@@H](Cc1ccccc1)C(=O)O"
    g = smiles_to_graph(s)
    x, ef = g["node_feat"], g["edge_feat"]
    assert g["num_nodes"] == 17
    assert (x[:, 1] > 0).sum() == 2                     # two stereocenters
    assert (x[:, 7] == 1).sum() == 6                    # benzene ring
    assert ef[:, 2].sum() >= 2 * 8                      # conjugated system
    assert x[:, 0].max() == 7 and x[:, 0].min() == 5    # C,N,O only


REAL_WORLD = [
    "Cn1c(=O)c2c(ncn2C)n(C)c1=O",                 # caffeine
    "CC(=O)Oc1ccccc1C(=O)O",                      # aspirin
    "CN1CCC[C@H]1c1cccnc1",                       # nicotine
    "O=[N+]([O-])c1ccccc1",                       # nitrobenzene
    "NS(=O)(=O)c1ccccc1",                         # benzenesulfonamide
    "OP(=O)(O)OC",                                # methyl phosphate
    "N[C@@H](Cc1c[nH]cn1)C(=O)O",                 # histidine
    "N[C@@H](Cc1c[nH]c2ccccc12)C(=O)O",           # tryptophan (fused)
    "N[C@@H](CSSC[C@H](N)C(=O)O)C(=O)O",          # cystine disulfide
    "c1ccc2ncccc2c1",                             # quinoline
    "CN=[N+]=[N-]",                               # methyl azide
    "[13C]([2H])([2H])[2H]",                      # isotopes
    "c1nnn[nH]1",                                 # tetrazole
    "c1cc[nH+]cc1",                               # pyridinium
    "C1CC1C1CC1",                                 # ring-digit reuse
    "CC(/C=C/C)=O",                               # stereo in branch context
    "c1cc[se]c1",                                 # selenophene
    "[NH4+].[Cl-]",                               # salt
]


@pytest.mark.parametrize("smi", REAL_WORLD)
def test_real_world_battery(smi):
    """Crash-free, structurally sane parse of common real-world motifs."""
    g = smiles_to_graph(smi)
    x, ei = g["node_feat"], g["edge_index"]
    assert x.shape[1] == 9 and (x >= 0).all()
    assert x[:, 0].max() <= 118 and x[:, 2].max() <= 11
    if ei.size:
        assert ei.max() < g["num_nodes"]
    # aromatic atoms and ring flags only ever co-occur
    assert (x[:, 7] <= x[:, 8]).all()
