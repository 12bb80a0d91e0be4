"""Native SMILES parser — no RDKit dependency.

The reference featurizer is built on RDKit (reference:
src/datasets/features.py:153-334).  RDKit is a heavyweight C++ dependency
that is not guaranteed in TPU images, so this framework ships its own
host-side SMILES parser covering the organic chemistry the model family
targets (QM9-class molecules and general drug-like SMILES):

- organic subset + bracket atoms (isotope, chirality, H-count, charge)
- branches, ring closures (incl. %nn), dot-separated fragments
- aromatic perception with kekulization (backtracking perfect matching)
- implicit hydrogen assignment per OpenSMILES normal-valence rules
- directional bonds (/ \\) for double-bond stereo, tetrahedral tags (@ @@)
- explicit-H expansion (AddHs equivalent: H atoms appended after heavy
  atoms, in heavy-atom order, matching RDKit's AddHs layout)

Known deviations from RDKit (documented, see chem/featurize.py):
- canonical SMILES output is not reproduced (we keep the input string);
- "potential" (unassigned) stereocenter detection uses symmetry-rank
  refinement rather than full CIP rules.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from .periodic import (
    AROMATIC_ORGANIC,
    DEFAULT_VALENCES,
    ELEMENTS,
    ORGANIC_SUBSET,
    SYMBOL_TO_Z,
    VALENCE_ELECTRONS,
)


class SmilesError(ValueError):
    pass


@dataclasses.dataclass
class Atom:
    atomic_num: int
    aromatic: bool = False
    charge: int = 0
    isotope: int = 0
    chiral: int = 0  # 0 none, 1 '@', 2 '@@'
    bracket: bool = False
    explicit_h: int = 0  # H count from bracket (only valid if bracket)
    implicit_h: int = 0  # computed for organic-subset atoms
    is_h: bool = False

    @property
    def symbol(self) -> str:
        return ELEMENTS[self.atomic_num - 1]

    @property
    def total_h(self) -> int:
        return self.explicit_h if self.bracket else self.implicit_h


@dataclasses.dataclass
class Bond:
    a1: int
    a2: int
    order: int  # 1, 2, 3, 4 (after kekulization for aromatic bonds)
    aromatic: bool = False
    direction: int = 0  # +1 '/' , -1 '\' as written from a1 to a2

    def other(self, idx: int) -> int:
        return self.a2 if idx == self.a1 else self.a1


class Molecule:
    """A parsed molecular graph (pre- or post- explicit-H expansion)."""

    def __init__(self) -> None:
        self.atoms: List[Atom] = []
        self.bonds: List[Bond] = []
        self._adj: Optional[List[List[int]]] = None  # atom -> bond indices

    def add_atom(self, atom: Atom) -> int:
        self.atoms.append(atom)
        self._adj = None
        return len(self.atoms) - 1

    def add_bond(self, a1: int, a2: int, order: int, aromatic=False, direction=0) -> int:
        self.bonds.append(Bond(a1, a2, order, aromatic, direction))
        self._adj = None
        return len(self.bonds) - 1

    @property
    def adjacency(self) -> List[List[int]]:
        if self._adj is None:
            adj: List[List[int]] = [[] for _ in self.atoms]
            for bi, b in enumerate(self.bonds):
                adj[b.a1].append(bi)
                adj[b.a2].append(bi)
            self._adj = adj
        return self._adj

    def neighbors(self, idx: int) -> List[int]:
        return [self.bonds[bi].other(idx) for bi in self.adjacency[idx]]

    def bond_order_sum(self, idx: int) -> int:
        return sum(self.bonds[bi].order for bi in self.adjacency[idx])

    def num_atoms(self) -> int:
        return len(self.atoms)


_TWO_LETTER = {"Cl", "Br"}  # organic subset two-letter symbols
_BOND_ORDERS = {"-": 1, "=": 2, "#": 3, "$": 4, ":": 1}


def _parse_bracket(s: str, i: int) -> Tuple[Atom, int]:
    """Parse a bracket atom starting at s[i] == '['; return (atom, next_i)."""
    j = s.index("]", i)
    body = s[i + 1 : j]
    k = 0
    isotope = 0
    while k < len(body) and body[k].isdigit():
        isotope = isotope * 10 + int(body[k])
        k += 1
    # element symbol (possibly aromatic lowercase)
    aromatic = False
    if k < len(body) and body[k : k + 2] in SYMBOL_TO_Z and body[k].isupper():
        # prefer two-letter if valid and next char is lowercase alpha that
        # forms a known element
        two = body[k : k + 2]
        one = body[k]
        if len(two) == 2 and two[1].islower() and two in SYMBOL_TO_Z:
            sym, k = two, k + 2
        else:
            sym, k = one, k + 1
    elif k < len(body) and body[k].isupper():
        sym, k = body[k], k + 1
    elif k < len(body) and body[k].islower():
        # aromatic symbol (c, n, o, s, p, b, se, as)
        if body[k : k + 2] in ("se", "as"):
            sym, k = body[k : k + 2].capitalize(), k + 2
        else:
            sym, k = body[k].upper(), k + 1
        aromatic = True
    else:
        raise SmilesError(f"Bad bracket atom: [{body}]")
    if sym == "*":
        raise SmilesError("Wildcard atoms not supported")
    if sym not in SYMBOL_TO_Z:
        raise SmilesError(f"Unknown element: {sym}")

    chiral = 0
    if k < len(body) and body[k] == "@":
        chiral = 1
        k += 1
        if k < len(body) and body[k] == "@":
            chiral = 2
            k += 1
        # Extended chirality classes like @TH1 — accept and skip
        for tag in ("TH1", "TH2", "AL1", "AL2", "SP1", "SP2", "SP3"):
            if body[k : k + len(tag)] == tag:
                k += len(tag)
                break

    h_count = 0
    if k < len(body) and body[k] == "H":
        k += 1
        h_count = 1
        n = 0
        while k < len(body) and body[k].isdigit():
            n = n * 10 + int(body[k])
            k += 1
        if n:
            h_count = n

    charge = 0
    while k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        n = 0
        while k < len(body) and body[k].isdigit():
            n = n * 10 + int(body[k])
            k += 1
        charge += sign * (n if n else 1)

    # atom-map class: ':' digits — parse and ignore
    if k < len(body) and body[k] == ":":
        k += 1
        while k < len(body) and body[k].isdigit():
            k += 1

    if k != len(body):
        raise SmilesError(f"Trailing characters in bracket atom: [{body}]")

    z = SYMBOL_TO_Z[sym]
    atom = Atom(
        atomic_num=z,
        aromatic=aromatic,
        charge=charge,
        isotope=isotope,
        chiral=chiral,
        bracket=True,
        explicit_h=h_count,
        is_h=(z == 1),
    )
    return atom, j + 1


def parse_smiles(smiles: str) -> Molecule:
    """Parse a SMILES string into a kekulized Molecule with implicit-H counts.

    Raises SmilesError on malformed input (callers treat that like the
    reference treats ``Chem.MolFromSmiles == None``)."""
    try:
        return _parse_smiles(smiles)
    except SmilesError:
        raise
    except (ValueError, IndexError) as e:
        # malformed syntax surfacing as str.index/int errors must still be
        # a SmilesError so featurizers drop the row instead of crashing
        raise SmilesError(f"Malformed SMILES {smiles!r}: {e}") from None


def _parse_smiles(smiles: str) -> Molecule:
    mol = Molecule()
    prev: Optional[int] = None
    stack: List[Optional[int]] = []
    # ring number -> (atom_idx, bond_char or None, direction)
    rings: Dict[int, Tuple[int, Optional[str], int]] = {}
    pending_bond: Optional[str] = None  # one of -=#$:/\
    i, n = 0, len(smiles)

    def _attach(new_idx: int) -> None:
        nonlocal prev, pending_bond
        if prev is not None:
            a1, a2 = prev, new_idx
            if pending_bond in ("/", "\\"):
                order, arom, direction = 1, False, (1 if pending_bond == "/" else -1)
            elif pending_bond is not None:
                order, arom, direction = _BOND_ORDERS[pending_bond], pending_bond == ":", 0
            else:
                both_arom = mol.atoms[a1].aromatic and mol.atoms[a2].aromatic
                order, arom, direction = 1, both_arom, 0
            mol.add_bond(a1, a2, order, arom, direction)
        prev = new_idx
        pending_bond = None

    while i < n:
        c = smiles[i]
        if c == "[":
            atom, i = _parse_bracket(smiles, i)
            _attach(mol.add_atom(atom))
        elif c.isalpha() or c == "*":
            if c == "*":
                raise SmilesError("Wildcard atoms not supported")
            two = smiles[i : i + 2]
            if two in _TWO_LETTER:
                sym, i = two, i + 2
                aromatic = False
            elif c.isupper():
                sym, i = c, i + 1
                aromatic = False
                if sym not in ORGANIC_SUBSET:
                    raise SmilesError(f"Atom '{sym}' must be written in brackets")
            else:
                if c not in AROMATIC_ORGANIC:
                    raise SmilesError(f"Bad aromatic atom '{c}'")
                sym, i = c.upper(), i + 1
                aromatic = True
            atom = Atom(atomic_num=SYMBOL_TO_Z[sym], aromatic=aromatic)
            _attach(mol.add_atom(atom))
        elif c in "-=#$:/\\":
            if pending_bond is not None:
                raise SmilesError("Two bond symbols in a row")
            pending_bond = c
            i += 1
        elif c == "(":
            stack.append(prev)
            i += 1
        elif c == ")":
            if not stack:
                raise SmilesError("Unmatched ')'")
            prev = stack.pop()
            i += 1
        elif c == ".":
            prev = None
            pending_bond = None
            i += 1
        elif c.isdigit() or c == "%":
            if prev is None:
                raise SmilesError("Ring closure before any atom")
            if c == "%":
                num = int(smiles[i + 1 : i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            direction = (
                1 if pending_bond == "/" else (-1 if pending_bond == "\\" else 0)
            )
            bond_char = pending_bond if pending_bond not in ("/", "\\") else None
            if num in rings:
                open_atom, open_char, open_dir = rings.pop(num)
                char = bond_char or open_char
                if bond_char and open_char and bond_char != open_char:
                    raise SmilesError("Conflicting ring-closure bond orders")
                if char is not None:
                    order, arom = _BOND_ORDERS[char], char == ":"
                else:
                    arom = mol.atoms[open_atom].aromatic and mol.atoms[prev].aromatic
                    order = 1
                # direction as written from the opening atom
                d = open_dir if open_dir else (-direction if direction else 0)
                mol.add_bond(open_atom, prev, order, arom, d)
            else:
                rings[num] = (prev, bond_char, direction)
            pending_bond = None
        elif c in " \t":
            break  # SMILES may be followed by a title
        else:
            raise SmilesError(f"Unexpected character {c!r}")

    if rings:
        raise SmilesError(f"Unclosed ring bonds: {sorted(rings)}")
    if stack:
        raise SmilesError("Unclosed branch '('")
    if pending_bond is not None:
        raise SmilesError("Dangling bond symbol")
    if not mol.atoms:
        raise SmilesError("Empty SMILES")

    _kekulize(mol)
    _assign_implicit_hydrogens(mol)
    return mol


def _kekulize(mol: Molecule) -> None:
    """Assign alternating double bonds within aromatic systems.

    Each aromatic atom that must carry one double bond ("needy": aromatic C
    without an existing explicit double bond, pyridine-type N/P, charged
    aromatic O/S) is matched to exactly one aromatic-bond neighbor by a
    backtracking perfect matching; matched bonds become order 2.
    """
    needy = set()
    for idx, atom in enumerate(mol.atoms):
        if not atom.aromatic:
            continue
        # existing explicit double/triple bond (e.g. quinoid c(=O)) satisfies it
        has_multiple = any(
            mol.bonds[bi].order >= 2 and not mol.bonds[bi].aromatic
            for bi in mol.adjacency[idx]
        )
        if has_multiple:
            continue
        sym = atom.symbol
        n_conn = len(mol.adjacency[idx]) + atom.total_h if atom.bracket else len(
            mol.adjacency[idx]
        )
        if sym == "C":
            if atom.charge == 0:
                needy.add(idx)
            # c+ / c- (e.g. tropylium/cyclopentadienyl): no double required
        elif sym in ("N", "P"):
            if atom.bracket and atom.explicit_h > 0:
                continue  # pyrrole-type [nH]
            if atom.charge == -1:
                continue  # [n-]
            if n_conn >= 3 and atom.charge == 0:
                continue  # substituted pyrrole-type n
            needy.add(idx)  # pyridine-type (2 connections) or [n+] with 3
        elif sym in ("O", "S", "Se"):
            if atom.charge == 1:
                needy.add(idx)  # pyrylium-type
        elif sym == "B":
            continue
        else:
            continue

    if not needy:
        return

    # candidate aromatic bonds between needy atoms
    cand: Dict[int, List[Tuple[int, int]]] = {a: [] for a in needy}
    for bi, b in enumerate(mol.bonds):
        if b.aromatic and b.a1 in needy and b.a2 in needy:
            cand[b.a1].append((b.a2, bi))
            cand[b.a2].append((b.a1, bi))

    order = sorted(needy, key=lambda a: len(cand[a]))
    matched: Dict[int, int] = {}
    chosen: List[int] = []

    def backtrack(pos: int) -> bool:
        while pos < len(order) and order[pos] in matched:
            pos += 1
        if pos == len(order):
            return True
        a = order[pos]
        for nbr, bi in cand[a]:
            if nbr not in matched:
                matched[a] = nbr
                matched[nbr] = a
                chosen.append(bi)
                if backtrack(pos + 1):
                    return True
                chosen.pop()
                del matched[a], matched[nbr]
        return False

    if not backtrack(0):
        raise SmilesError("Kekulization failed (non-alternating aromatic system)")
    for bi in chosen:
        mol.bonds[bi].order = 2


def _assign_implicit_hydrogens(mol: Molecule) -> None:
    for idx, atom in enumerate(mol.atoms):
        if atom.bracket:
            atom.implicit_h = 0
            continue
        sym = atom.symbol
        valences = DEFAULT_VALENCES.get(sym)
        if valences is None:
            atom.implicit_h = 0
            continue
        bsum = mol.bond_order_sum(idx)
        atom.implicit_h = next((v - bsum for v in valences if v >= bsum), 0)


def add_hydrogens(mol: Molecule) -> Molecule:
    """Expand implicit/bracket H counts into explicit H atoms.

    Heavy atoms keep their indices; H atoms are appended afterwards in
    heavy-atom order (RDKit AddHs layout, so downstream index-based features
    are comparable)."""
    out = Molecule()
    for atom in mol.atoms:
        out.add_atom(dataclasses.replace(atom))
    for b in mol.bonds:
        out.add_bond(b.a1, b.a2, b.order, b.aromatic, b.direction)
    for idx in range(len(mol.atoms)):
        atom = out.atoms[idx]
        for _ in range(atom.total_h):
            h = out.add_atom(Atom(atomic_num=1, is_h=True))
            out.add_bond(idx, h, 1)
        atom.explicit_h = 0
        atom.implicit_h = 0
    return out


def hybridization(mol: Molecule, idx: int) -> str:
    """Estimate hybridization (S/SP/SP2/SP3/SP3D/SP3D2/OTHER).

    Aromatic atoms are SP2; otherwise steric number = σ-bonds + lone pairs
    with lone pairs from main-group valence electron counts.  This matches
    RDKit on organic molecules (the model only consumes the 6-way index with
    an OOV bucket, reference: src/datasets/constants.py:11-18)."""
    atom = mol.atoms[idx]
    if atom.aromatic:
        return "SP2"
    ve = VALENCE_ELECTRONS.get(atom.atomic_num)
    if ve is None:
        return "OTHER"
    sigma = len(mol.adjacency[idx]) + atom.total_h
    bsum = mol.bond_order_sum(idx) + atom.total_h
    lone_pairs = max(0, (ve - atom.charge - bsum) // 2)
    steric = sigma + lone_pairs
    return {1: "S", 2: "SP", 3: "SP2", 4: "SP3", 5: "SP3D", 6: "SP3D2"}.get(
        steric, "OTHER"
    )


def total_formal_charge(mol: Molecule) -> int:
    return sum(a.charge for a in mol.atoms)


def symmetry_ranks(mol: Molecule) -> List[int]:
    """Canonical-ish symmetry classes via iterative neighborhood refinement
    (Morgan/Weisfeiler-Lehman).  Used for potential-stereocenter detection."""
    ranks = [
        hash((a.atomic_num, a.charge, a.total_h, len(mol.adjacency[i]), a.aromatic))
        for i, a in enumerate(mol.atoms)
    ]
    # compress to small ints
    def compress(vals):
        uniq = {v: r for r, v in enumerate(sorted(set(vals)))}
        return [uniq[v] for v in vals]

    ranks = compress(ranks)
    for _ in range(len(mol.atoms)):
        new = []
        for i in range(len(mol.atoms)):
            nb = sorted(
                (ranks[mol.bonds[bi].other(i)], mol.bonds[bi].order)
                for bi in mol.adjacency[i]
            )
            new.append(hash((ranks[i], tuple(nb))))
        new = compress(new)
        if new == ranks:
            break
        ranks = new
    return ranks
