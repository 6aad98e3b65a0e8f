"""Pure-Python SMILES → OGB-featurized molecular graph.

The reference builds Peptides-functional/structural and PCQM4Mv2 graphs with
``ogb.utils.smiles2graph`` (reference peptides_functional.py:8,100, which
requires rdkit). This module reproduces that featurization without rdkit so
the raw CSV layouts of those datasets parse in any environment:

- atom features (9 ints): atomic number, chirality tag, total degree
  (incl. Hs), formal charge, total num Hs, radical electrons, hybridization,
  aromatic flag, in-ring flag — the exact OGB ``atom_to_feature_vector``
  index scheme (cardinalities [119,4,12,12,10,6,6,2,2]).
- bond features (3 ints): bond type (single/double/triple/aromatic),
  stereo (NONE/Z/E/...), conjugated flag — OGB ``bond_to_feature_vector``.
- edge order: one (i,j),(j,i) pair per bond in bond-creation order, exactly
  like ``ogb.utils.mol.smiles2graph``.

Conventions reproduced from rdkit (documented because they are observable in
the feature values):

- *Chirality tags*: ``@``/``@@`` are interpreted per the SMILES spec (neighbor
  list in text order, an in-bracket implicit H occupying the position right
  after the preceding atom, ring-closure partners at their digit positions).
  rdkit stores the tag relative to the atom's final bond list (bonds in
  creation order — ring-closure bonds are created when the ring *closes* —
  with the implicit H counted last), so we convert by permutation parity.
  ``@`` → CHI_TETRAHEDRAL_CCW, ``@@`` → CHI_TETRAHEDRAL_CW.
- *Implicit hydrogens*: smallest standard valence ≥ the bond-order sum
  (aromatic atoms use Kekulé orders assigned by a backtracking matcher);
  bracket atoms use their explicit H count.
- *Hybridization*: rdkit's electron-counting rule — σ-neighbors (incl. Hs)
  plus lone pairs, where lone pairs = (outer-shell e⁻ − total valence −
  formal charge) // 2; aromatic atoms report SP2. (This is rdkit's
  ``numBondsPlusLonePairs``; e.g. amide N counts as SP3.)
- *Conjugation*: rdkit's ``setConjugation`` rule — at any atom with 2–3
  σ-neighbors carrying a multiple/aromatic bond, every other bond to a
  C/N/O/P/S atom with ≤3 σ-neighbors is marked conjugated (as is the
  multiple bond itself).
- *Bond stereo*: directional ``/``/``\\`` bonds around a double bond map to
  STEREOE (opposite sides) / STEREOZ (same side) — rdkit's legacy enums,
  the ones OGB's published features use.
- *Aromaticity*: lowercase input is trusted (rdkit-canonical SMILES — what
  the Peptides/PCQM4Mv2 CSVs contain). Kekulé-written rings are additionally
  perceived by a per-ring Hückel (4n+2) count covering the common mono- and
  fused-ring chemistry (benzene, pyridine, pyrrole, imidazole, indole, …);
  exotic fused systems that only global perception would catch (e.g.
  azulene written Kekulé) are out of scope and raise nothing — they simply
  stay non-aromatic.

No dependency beyond numpy. Graph-construction throughput is ~10⁴ small
molecules/s — fine for Peptides (15.5k); for PCQM4Mv2's 3.7M rows prefer the
``processed.npz`` cache (tools/export_cache.py) and treat this as the
no-rdkit fallback.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Element tables
# ---------------------------------------------------------------------------

_SYMBOLS = (
    "H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe Co "
    "Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn Sb "
    "Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta W Re "
    "Os Ir Pt Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu"
).split()
_ATOMIC_NUM = {s: i + 1 for i, s in enumerate(_SYMBOLS)}

# outer-shell electron count by group (main-group elements)
_OUTER = {1: 1, 2: 2, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7, 10: 8,
          11: 1, 12: 2, 13: 3, 14: 4, 15: 5, 16: 6, 17: 7, 18: 8,
          19: 1, 20: 2, 31: 3, 32: 4, 33: 5, 34: 6, 35: 7, 36: 8,
          37: 1, 38: 2, 49: 3, 50: 4, 51: 5, 52: 6, 53: 7, 54: 8,
          55: 1, 56: 2, 81: 3, 82: 4, 83: 5, 84: 6, 85: 7, 86: 8}

# standard valences of the organic subset (+ common bracket elements),
# indexed by (symbol, formal charge) via _allowed_valences()
_BASE_VALENCE = {"B": [3], "C": [4], "N": [3], "O": [2], "P": [3, 5],
                 "S": [2, 4, 6], "F": [1], "Cl": [1], "Br": [1],
                 "I": [1, 3, 5], "Se": [2, 4, 6], "As": [3, 5],
                 "Si": [4], "H": [1]}

_ORGANIC = ("Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I")
_AROM_ORGANIC = {"b": "B", "c": "C", "n": "N", "o": "O", "p": "P", "s": "S"}
_CONJ_ELEMS = frozenset((6, 7, 8, 15, 16))  # C N O P S — rdkit's candidates


# valences of charged atoms, per rdkit's periodic-table defaults
# (N+→4, N-→2, O+→3, O-→1, S+→[3,5], B-→4, …)
_CHARGED_VALENCE = {
    ("C", 1): [3], ("C", -1): [3],
    ("N", 1): [4], ("N", -1): [2],
    ("O", 1): [3], ("O", -1): [1],
    ("S", 1): [3, 5], ("S", -1): [1],
    ("P", 1): [4], ("P", -1): [2],
    ("B", -1): [4], ("B", 1): [2],
    ("F", 1): [2], ("Cl", 1): [2], ("Br", 1): [2], ("I", 1): [2],
    ("Se", -1): [1], ("Se", 1): [3],
}


def _valences(symbol: str, charge: int) -> List[int]:
    if charge == 0:
        return _BASE_VALENCE.get(symbol, [])
    return _CHARGED_VALENCE.get((symbol, charge), [])


# ---------------------------------------------------------------------------
# Molecule model
# ---------------------------------------------------------------------------

class _Atom:
    __slots__ = ("idx", "symbol", "aromatic", "charge", "explicit_h",
                 "isotope", "chiral", "text_nbrs", "bond_ids", "num_h",
                 "radicals")

    def __init__(self, idx, symbol, aromatic, charge=0, explicit_h=None,
                 isotope=0, chiral=None):
        self.idx = idx
        self.symbol = symbol            # proper-case element symbol
        self.aromatic = aromatic
        self.charge = charge
        self.explicit_h = explicit_h    # None ⇒ organic-subset implicit rules
        self.isotope = isotope
        self.chiral = chiral            # '@', '@@', 'other', or None
        self.text_nbrs: List = []       # chirality order: atom idx or 'H'
        self.bond_ids: List[int] = []   # storage order (bond-creation order)
        self.num_h = 0
        self.radicals = 0


class _Bond:
    __slots__ = ("idx", "a", "b", "order", "aromatic", "direction", "in_ring",
                 "conjugated", "stereo")

    def __init__(self, idx, a, b, order, aromatic, direction=None):
        self.idx = idx
        self.a = a                      # begin atom (SMILES text order)
        self.b = b
        self.order = order              # Kekulé order 1/2/3 or None (→kekulize)
        self.aromatic = aromatic
        self.direction = direction      # '/' or '\\' as written begin→end
        self.in_ring = False
        self.conjugated = False
        self.stereo = "STEREONONE"

    def other(self, i: int) -> int:
        return self.b if i == self.a else self.a


class Molecule:
    """Parsed molecule with rdkit-equivalent derived properties."""

    def __init__(self):
        self.atoms: List[_Atom] = []
        self.bonds: List[_Bond] = []

    def neighbors(self, i: int) -> List[int]:
        return [self.bonds[b].other(i) for b in self.atoms[i].bond_ids]


class SmilesError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer / parser
# ---------------------------------------------------------------------------

_BOND_ORDER = {"-": 1, "=": 2, "#": 3, "$": 4, ":": None, "/": 1, "\\": 1}


def _parse_bracket(s: str, i: int) -> Tuple[dict, int]:
    """Parse the inside of ``[...]`` starting after '['; returns fields and
    the index just past ']'."""
    j = s.index("]", i)
    body, out = s[i:j], {}
    k = 0
    # isotope
    n = ""
    while k < len(body) and body[k].isdigit():
        n += body[k]
        k += 1
    out["isotope"] = int(n) if n else 0
    # element symbol: two-letter first ([Cl] vs [C]), aromatic lowercase forms
    sym2 = body[k:k + 2] if len(body) - k >= 2 else ""
    sym1 = body[k:k + 1]
    if sym2 in ("se", "as", "te"):
        out["symbol"], out["aromatic"] = sym2.capitalize(), True
        k += 2
    elif sym2 in _ATOMIC_NUM:
        out["symbol"], out["aromatic"] = sym2, False
        k += 2
    elif sym1 in _ATOMIC_NUM:
        out["symbol"], out["aromatic"] = sym1, False
        k += 1
    elif sym1 in "bcnops":
        out["symbol"], out["aromatic"] = sym1.upper(), True
        k += 1
    elif sym1 == "*":
        out["symbol"], out["aromatic"] = "*", False
        k += 1
    else:
        raise SmilesError(f"bad bracket atom: [{body}]")
    # chirality
    chiral = None
    if k < len(body) and body[k] == "@":
        k += 1
        if k < len(body) and body[k] == "@":
            chiral = "@@"
            k += 1
        else:
            chiral = "@"
            # named classes: TH1==@, TH2==@@; everything else → 'other'
            for name in ("TH1", "TH2", "AL1", "AL2", "SP1", "SP2", "SP3",
                         "TB", "OH"):
                if body[k:k + len(name)] == name:
                    rest = body[k + len(name):]
                    nd = 0
                    while nd < len(rest) and rest[nd].isdigit():
                        nd += 1
                    k += len(name) + nd
                    chiral = {"TH1": "@", "TH2": "@@"}.get(name, "other")
                    break
    out["chiral"] = chiral
    # explicit hydrogens
    nh = 0
    if k < len(body) and body[k] == "H":
        k += 1
        n = ""
        while k < len(body) and body[k].isdigit():
            n += body[k]
            k += 1
        nh = int(n) if n else 1
    out["explicit_h"] = nh
    # charge
    charge = 0
    while k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        n = ""
        while k < len(body) and body[k].isdigit():
            n += body[k]
            k += 1
        charge += sign * (int(n) if n else 1)
    out["charge"] = charge
    # atom map (ignored)
    if k < len(body) and body[k] == ":":
        k += 1
        while k < len(body) and body[k].isdigit():
            k += 1
    if k != len(body):
        raise SmilesError(f"trailing bracket content: [{body}]")
    return out, j + 1


def parse_smiles(s: str) -> Molecule:
    """Parse a SMILES string into a :class:`Molecule` (no sanitization yet)."""
    mol = Molecule()
    prev: Optional[int] = None
    stack: List[Optional[int]] = []
    pending: Optional[str] = None          # bond symbol awaiting next atom
    rings: Dict[int, Tuple[int, Optional[str], int]] = {}
    i, n = 0, len(s)

    def new_bond(a: int, b: int, sym: Optional[str]) -> _Bond:
        atoms = mol.atoms
        if sym == ":" or (sym is None and atoms[a].aromatic
                          and atoms[b].aromatic):
            order, aromatic = None, True
        elif sym in ("/", "\\"):
            order, aromatic = 1, False
        elif sym is None:
            order, aromatic = 1, False
        else:
            order, aromatic = _BOND_ORDER[sym], False
            if order == 4:
                raise SmilesError("quadruple bonds unsupported")
        bond = _Bond(len(mol.bonds), a, b, order, aromatic,
                     direction=sym if sym in ("/", "\\") else None)
        mol.bonds.append(bond)
        atoms[a].bond_ids.append(bond.idx)
        atoms[b].bond_ids.append(bond.idx)
        return bond

    def add_atom(**kw) -> int:
        nonlocal prev, pending
        idx = len(mol.atoms)
        mol.atoms.append(_Atom(idx, **kw))
        if prev is not None:
            new_bond(prev, idx, pending)
            mol.atoms[idx].text_nbrs.append(prev)
            mol.atoms[prev].text_nbrs.append(idx)
        # in-bracket implicit H sits right after the preceding atom in the
        # chirality neighbor ordering (OpenSMILES §3.9.2)
        a = mol.atoms[idx]
        if a.chiral and (a.explicit_h or 0) >= 1:
            a.text_nbrs.append("H")
        pending, prev = None, idx
        return idx

    while i < n:
        c = s[i]
        if c in " \t\r\n":
            break
        if c == "[":
            fields, i = _parse_bracket(s, i + 1)
            add_atom(symbol=fields["symbol"], aromatic=fields["aromatic"],
                     charge=fields["charge"],
                     explicit_h=fields["explicit_h"],
                     isotope=fields["isotope"], chiral=fields["chiral"])
            continue
        if s[i:i + 2] in ("Cl", "Br"):
            add_atom(symbol=s[i:i + 2], aromatic=False)
            i += 2
            continue
        if c in "BCNOPSFI*":
            add_atom(symbol=c if c != "*" else "*", aromatic=False)
            i += 1
            continue
        if c in _AROM_ORGANIC:
            add_atom(symbol=_AROM_ORGANIC[c], aromatic=True)
            i += 1
            continue
        if c in _BOND_ORDER:
            if pending is not None:
                raise SmilesError(f"two bond symbols in a row at {i}")
            pending = c
            i += 1
            continue
        if c == "(":
            stack.append(prev)
            i += 1
            continue
        if c == ")":
            if not stack:
                raise SmilesError("unbalanced ')'")
            prev = stack.pop()
            i += 1
            continue
        if c == ".":
            prev, pending = None, None
            i += 1
            continue
        if c.isdigit() or c == "%":
            if c == "%":
                num = int(s[i + 1:i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            if prev is None:
                raise SmilesError("ring digit before any atom")
            if num in rings:
                a, sym_a, pos_a = rings.pop(num)
                sym_b = pending
                pending = None
                if sym_a and sym_b and sym_a != sym_b and \
                        {sym_a, sym_b} != {"/", "\\"}:
                    raise SmilesError(f"conflicting ring-bond symbols {num}")
                # direction is interpreted as written at the OPENING position
                sym = sym_a if sym_a is not None else (
                    # a closing-side direction is written from the closing
                    # atom's perspective; flip it to begin(=open)→end
                    {"/": "\\", "\\": "/"}[sym_b]
                    if sym_b in ("/", "\\") else sym_b)
                if a == prev:
                    raise SmilesError("self-bond ring closure")
                new_bond(a, prev, sym)
                # chirality text order: opener at its digit position (already
                # reserved), closer at the current position
                mol.atoms[a].text_nbrs[pos_a] = prev
                mol.atoms[prev].text_nbrs.append(a)
            else:
                rings[num] = (prev, pending, len(mol.atoms[prev].text_nbrs))
                mol.atoms[prev].text_nbrs.append(("ring", num))
                pending = None
            continue
        raise SmilesError(f"unexpected character {c!r} at {i} in {s!r}")

    if rings:
        raise SmilesError(f"unclosed ring bonds: {sorted(rings)}")
    if stack:
        raise SmilesError("unbalanced '('")
    if pending is not None:
        raise SmilesError("dangling bond symbol")
    _sanitize(mol)
    return mol


# ---------------------------------------------------------------------------
# Sanitization: rings, aromaticity, kekulization, valence, stereo
# ---------------------------------------------------------------------------

def _mark_rings(mol: Molecule) -> None:
    """A bond is in a ring iff it is not a bridge (Tarjan low-link)."""
    n = len(mol.atoms)
    disc = [-1] * n
    low = [0] * n
    timer = [0]

    def dfs(root: int) -> None:
        # iterative DFS to survive peptide-scale chains
        stack = [(root, -1, iter(mol.atoms[root].bond_ids))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            u, pb, it = stack[-1]
            advanced = False
            for bid in it:
                if bid == pb:
                    continue
                v = mol.bonds[bid].other(u)
                if disc[v] == -1:
                    disc[v] = low[v] = timer[0]
                    timer[0] += 1
                    stack.append((v, bid, iter(mol.atoms[v].bond_ids)))
                    advanced = True
                    break
                low[u] = min(low[u], disc[v])
                mol.bonds[bid].in_ring = mol.bonds[bid].in_ring or \
                    disc[v] < disc[u]  # back edge closes a cycle
            if not advanced:
                stack.pop()
                if stack:
                    w = stack[-1][0]
                    low[w] = min(low[w], low[u])
                    if low[u] <= disc[w]:       # tree edge (w,u) on a cycle
                        mol.bonds[pb].in_ring = True

    for a in range(n):
        if disc[a] == -1 and mol.atoms[a].bond_ids:
            dfs(a)


def _small_rings(mol: Molecule, max_len: int = 7) -> List[List[int]]:
    """Shortest cycle through each ring bond (Horton-style), deduplicated —
    enough ring coverage for Hückel perception of 3–7-membered rings."""
    ring_bonds = [b for b in mol.bonds if b.in_ring]
    adj: Dict[int, List[Tuple[int, int]]] = {}
    for b in ring_bonds:
        adj.setdefault(b.a, []).append((b.b, b.idx))
        adj.setdefault(b.b, []).append((b.a, b.idx))
    seen, rings = set(), []
    for b in ring_bonds:
        # BFS from b.a to b.b avoiding bond b
        par: Dict[int, Tuple[int, int]] = {b.a: (-1, -1)}
        frontier = [b.a]
        depth = 0
        found = False
        while frontier and depth < max_len and not found:
            nxt = []
            for u in frontier:
                for v, bid in adj.get(u, ()):
                    if bid == b.idx or v in par:
                        continue
                    par[v] = (u, bid)
                    if v == b.b:
                        found = True
                        break
                    nxt.append(v)
                if found:
                    break
            frontier = nxt
            depth += 1
        if not found:
            continue
        path = [b.b]
        u = b.b
        while par[u][0] != -1:
            u = par[u][0]
            path.append(u)
        key = frozenset(path)
        if key not in seen and len(path) <= max_len:
            seen.add(key)
            rings.append(path)
    return rings


def _perceive_aromaticity(mol: Molecule) -> None:
    """Hückel 4n+2 perception for Kekulé-written rings (common cases)."""
    bond_of = {}
    for b in mol.bonds:
        bond_of[(b.a, b.b)] = bond_of[(b.b, b.a)] = b
    for ring in _small_rings(mol):
        members = set(ring)
        ring_bonds = []
        ok = True
        for k in range(len(ring)):
            bnd = bond_of.get((ring[k], ring[(k + 1) % len(ring)]))
            if bnd is None:
                ok = False
                break
            ring_bonds.append(bnd)
        if not ok or all(b.aromatic for b in ring_bonds):
            continue
        pi = 0
        for a_idx in ring:
            atom = mol.atoms[a_idx]
            in_ring_double = any(
                mol.bonds[bid].order == 2 and
                mol.bonds[bid].other(a_idx) in members
                for bid in atom.bond_ids)
            exo_double = any(
                (mol.bonds[bid].order or 1) >= 2 and
                mol.bonds[bid].other(a_idx) not in members
                for bid in atom.bond_ids)
            nconn = len(atom.bond_ids) + (atom.explicit_h or 0)
            if in_ring_double or atom.aromatic:
                pi += 1
            elif exo_double:
                pi += 0
            elif atom.symbol in ("N", "P") and atom.charge == 0:
                pi += 2          # pyrrole-type lone pair
            elif atom.symbol in ("O", "S", "Se") and atom.charge == 0 \
                    and nconn == 2:
                pi += 2
            elif atom.symbol == "C" and atom.charge == -1:
                pi += 2
            elif atom.symbol == "C" and atom.charge == 1:
                pi += 0
            elif atom.symbol in ("N",) and atom.charge == 1 and nconn >= 3:
                pi += 1          # pyridinium-type (needs the double bond)
            else:
                ok = False
                break
        if ok and pi % 4 == 2:
            for a_idx in ring:
                mol.atoms[a_idx].aromatic = True
            for bnd in ring_bonds:
                bnd.aromatic = True


def _kekulize(mol: Molecule) -> None:
    """Assign Kekulé orders to aromatic bonds lacking one (lowercase input)
    via exact backtracking matching on atoms that need a π bond."""
    arom_bonds = [b for b in mol.bonds if b.aromatic and b.order is None]
    if not arom_bonds:
        return
    for b in arom_bonds:
        b.order = 1
    needs = set()
    for b in arom_bonds:
        for a_idx in (b.a, b.b):
            if a_idx in needs or not _needs_pi(mol, a_idx):
                continue
            needs.add(a_idx)
    adj: Dict[int, List[Tuple[int, _Bond]]] = {}
    for b in arom_bonds:
        adj.setdefault(b.a, []).append((b.b, b))
        adj.setdefault(b.b, []).append((b.a, b))
    matched: Dict[int, int] = {}

    order = sorted(needs, key=lambda a: len(adj.get(a, ())))

    def backtrack(k: int) -> bool:
        while k < len(order) and order[k] in matched:
            k += 1
        if k == len(order):
            return True
        u = order[k]
        for v, bnd in adj.get(u, ()):
            if v in needs and v not in matched:
                matched[u], matched[v] = v, u
                bnd.order = 2
                if backtrack(k + 1):
                    return True
                bnd.order = 1
                del matched[u], matched[v]
        return False

    if not backtrack(0):
        raise SmilesError("kekulization failed (unmatched aromatic system)")


def _needs_pi(mol: Molecule, a_idx: int) -> bool:
    """Does this aromatic atom contribute one electron to a ring double bond
    (pyridine-type) rather than a full lone pair (pyrrole-type)?"""
    atom = mol.atoms[a_idx]
    if any((mol.bonds[bid].order or 1) >= 2 for bid in atom.bond_ids):
        return False             # exocyclic (or pre-assigned) double bond
    nconn = len(atom.bond_ids) + (atom.explicit_h or 0)
    sym, chg = atom.symbol, atom.charge
    if sym in ("C", "B"):
        return chg == 0          # c+ / c- contribute 0 / 2 electrons
    if sym in ("N", "P", "As"):
        if chg == 0:
            return nconn == 2    # pyridine-type; 3-connected = pyrrole-type
        return chg == 1 and nconn == 3   # pyridinium [nH+] / N-alkyl [n+]
    if sym in ("O", "S", "Se", "Te"):
        return chg == 1          # pylium-type o+
    return False


def _assign_hydrogens(mol: Molecule) -> None:
    for atom in mol.atoms:
        bondsum = sum(mol.bonds[bid].order or 1 for bid in atom.bond_ids)
        if atom.explicit_h is not None:
            atom.num_h = atom.explicit_h
            ev = bondsum + atom.num_h
            vals = [v for v in _valences(atom.symbol, atom.charge) if v >= ev]
            atom.radicals = (min(vals) - ev) if vals else 0
            continue
        atom.radicals = 0
        vals = [v for v in _valences(atom.symbol, atom.charge)
                if v >= bondsum]
        atom.num_h = (min(vals) - bondsum) if vals else 0


def _assign_conjugation(mol: Molecule) -> None:
    """rdkit MolOps::setConjugation (see module docstring)."""
    def sigma(a: _Atom) -> int:
        return len(a.bond_ids) + a.num_h

    def eligible(a: _Atom) -> bool:
        return _ATOMIC_NUM.get(a.symbol, 0) in _CONJ_ELEMS

    for atom in mol.atoms:
        if not eligible(atom) or not (2 <= sigma(atom) <= 3):
            continue
        for b1id in atom.bond_ids:
            b1 = mol.bonds[b1id]
            if not (b1.aromatic or (b1.order or 1) >= 2):
                continue
            for b2id in atom.bond_ids:
                if b2id == b1id:
                    continue
                b2 = mol.bonds[b2id]
                other = mol.atoms[b2.other(atom.idx)]
                if sigma(other) > 3 or not eligible(other):
                    continue
                b1.conjugated = b2.conjugated = True


def _assign_bond_stereo(mol: Molecule) -> None:
    for b in mol.bonds:
        if b.order != 2 or b.in_ring:
            continue
        sides = []
        for end in (b.a, b.b):
            chosen = None
            for bid in mol.atoms[end].bond_ids:
                nb = mol.bonds[bid]
                if nb.direction is None or nb.idx == b.idx:
                    continue
                # normalize the written symbol to "from the double-bond atom
                # outward": flip when the directional bond *ends* at `end`
                d = nb.direction
                if nb.b == end:
                    d = {"/": "\\", "\\": "/"}[d]
                chosen = d
                break
            sides.append(chosen)
        if sides[0] and sides[1]:
            # same normalized symbol ⇒ substituents on the same side (Z)
            b.stereo = "STEREOZ" if sides[0] == sides[1] else "STEREOE"


def _chiral_tag(mol: Molecule, atom: _Atom) -> str:
    """Convert the parsed '@'/'@@' into rdkit's stored tag (see docstring)."""
    if atom.chiral is None:
        return "CHI_UNSPECIFIED"
    if atom.chiral == "other":
        return "CHI_OTHER"
    text = list(atom.text_nbrs)
    storage: List = [mol.bonds[bid].other(atom.idx)
                     for bid in atom.bond_ids]
    if "H" in text:
        storage.append("H")     # rdkit counts the implicit H last
    if len(text) != 4 or sorted(map(str, text)) != sorted(map(str, storage)):
        return "CHI_UNSPECIFIED"
    # permutation parity text → storage (entries are unique: distinct atom
    # indices plus at most one 'H')
    perm = [storage.index(t) for t in text]
    inv = sum(1 for x in range(4) for y in range(x + 1, 4)
              if perm[x] > perm[y])
    flipped = inv % 2 == 1
    at = atom.chiral
    if flipped:
        at = "@@" if at == "@" else "@"
    return "CHI_TETRAHEDRAL_CCW" if at == "@" else "CHI_TETRAHEDRAL_CW"


def _sanitize(mol: Molecule) -> None:
    _mark_rings(mol)
    _perceive_aromaticity(mol)
    _kekulize(mol)
    _assign_hydrogens(mol)
    _assign_conjugation(mol)
    _assign_bond_stereo(mol)


# ---------------------------------------------------------------------------
# OGB feature extraction
# ---------------------------------------------------------------------------

_CHIRAL_LIST = ("CHI_UNSPECIFIED", "CHI_TETRAHEDRAL_CW",
                "CHI_TETRAHEDRAL_CCW", "CHI_OTHER")
_HYB_LIST = ("SP", "SP2", "SP3", "SP3D", "SP3D2")
_STEREO_LIST = ("STEREONONE", "STEREOZ", "STEREOE", "STEREOCIS",
                "STEREOTRANS", "STEREOANY")


def _hybridization(mol: Molecule, atom: _Atom) -> str:
    if atom.aromatic:
        return "SP2"
    z = _ATOMIC_NUM.get(atom.symbol, 0)
    outer = _OUTER.get(z)
    if outer is None:
        return "misc"
    valence = sum(mol.bonds[bid].order or 1
                  for bid in atom.bond_ids) + atom.num_h
    sigma = len(atom.bond_ids) + atom.num_h
    lone = max(0, (outer - valence - atom.charge) // 2)
    # an unpaired (radical) electron occupies an orbital of its own
    norbs = sigma + lone + (1 if atom.radicals else 0)
    return {2: "SP", 3: "SP2", 4: "SP3", 5: "SP3D", 6: "SP3D2"}.get(
        norbs, "misc")


def _atom_feature(mol: Molecule, atom: _Atom) -> List[int]:
    z = _ATOMIC_NUM.get(atom.symbol, 0)
    deg = len(atom.bond_ids) + atom.num_h
    return [
        z - 1 if 1 <= z <= 118 else 118,                       # atomic num
        _CHIRAL_LIST.index(_chiral_tag(mol, atom)),            # chirality
        deg if deg <= 10 else 11,                              # total degree
        atom.charge + 5 if -5 <= atom.charge <= 5 else 11,     # formal charge
        atom.num_h if 0 <= atom.num_h <= 8 else 9,             # total Hs
        atom.radicals if 0 <= atom.radicals <= 4 else 5,       # radicals
        (_HYB_LIST.index(h) if (h := _hybridization(mol, atom))
         in _HYB_LIST else 5),                                 # hybridization
        int(atom.aromatic),
        int(any(mol.bonds[b].in_ring for b in atom.bond_ids)),
    ]


_BOND_TYPE_IDX = {1: 0, 2: 1, 3: 2}


def _bond_feature(bond: _Bond) -> List[int]:
    if bond.aromatic:
        t = 3
    else:
        t = _BOND_TYPE_IDX.get(bond.order, 4)
    return [t, _STEREO_LIST.index(bond.stereo), int(bond.conjugated)]


def smiles_to_graph(smiles: str) -> Dict[str, np.ndarray]:
    """OGB-compatible graph dict: ``node_feat (N,9) int64``, ``edge_index
    (2,2E) int64`` (both directions per bond, creation order), ``edge_feat
    (2E,3) int64``, ``num_nodes`` — the exact contract of
    ``ogb.utils.smiles2graph`` (reference peptides_functional.py:100-110)."""
    mol = parse_smiles(smiles)
    x = np.array([_atom_feature(mol, a) for a in mol.atoms],
                 dtype=np.int64).reshape(len(mol.atoms), 9)
    if mol.bonds:
        edges, feats = [], []
        for b in mol.bonds:
            f = _bond_feature(b)
            edges.append((b.a, b.b))
            feats.append(f)
            edges.append((b.b, b.a))
            feats.append(f)
        edge_index = np.array(edges, dtype=np.int64).T
        edge_feat = np.array(feats, dtype=np.int64)
    else:
        edge_index = np.empty((2, 0), dtype=np.int64)
        edge_feat = np.empty((0, 3), dtype=np.int64)
    return {"node_feat": x, "edge_index": edge_index,
            "edge_feat": edge_feat, "num_nodes": len(mol.atoms)}
