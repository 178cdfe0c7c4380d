"""Amber prmtop/inpcrd readers -> System pytrees.

The reference builds its molecular test systems (alanine dipeptide, host–
guest, DHFR, ...) by loading Amber parameter files through openmm.app
(testsystems.py:3352-4145, data files under ``openmmtools/data/``). This
module parses the (public, documented) Amber prmtop format directly into a
:class:`openmmtools_tpu.system.System`:

* CHARGE is stored as q * 18.2223 (kcal^1/2 Å^1/2): divided out.
* Bond/angle force constants use the Amber convention U = K (r - r0)^2
  (no 1/2): converted to the OpenMM/harmonic convention k = 2 K, with kcal/Å
  -> kJ/nm unit conversion.
* LENNARD_JONES_ACOEF/BCOEF diagonal entries give per-type sigma/epsilon
  (A = 4 eps sig^12, B = 4 eps sig^6); Lorentz–Berthelot combination is then
  used (exact for standard Amber force fields, which are LB-combined).
* 1-2 and 1-3 pairs are fully excluded; 1-4 pairs become exceptions with
  chargeprod / SCEE and epsilon / SCNB (defaults 1.2 / 2.0).
* ``constraints='h-bonds'`` converts hydrogen bonds to distance constraints
  (the reference's app.HBonds default for AlanineDipeptideVacuum,
  testsystems.py:3371).
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from openmmtools_tpu.system import (
    Constraints,
    HarmonicAngleTerm,
    HarmonicBondTerm,
    NonbondedTerm,
    PeriodicTorsionTerm,
    System,
    no_constraints,
)

KCAL = 4.184
A2NM = 0.1
AMBER_CHARGE = 18.2223

# default location of the reference's data files (read-only); override with
# the OPENMMTOOLS_TPU_DATA environment variable
DEFAULT_DATA_DIR = os.environ.get(
    "OPENMMTOOLS_TPU_DATA", "/root/reference/openmmtools/data")


_NATIVE_PRMTOP = None


def _native_prmtop_lib():
    """Load the C++ prmtop parser (native/prmtop_parser.cpp) via ctypes.
    Returns None when the shared library is unavailable — the pure-Python
    parser below is the permanent fallback and correctness oracle."""
    global _NATIVE_PRMTOP
    if _NATIVE_PRMTOP is not None:
        return _NATIVE_PRMTOP or None
    import ctypes
    import os

    so = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                      "libprmtop.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(so))
    except OSError:
        _NATIVE_PRMTOP = False
        return None
    lib.prmtop_open.restype = ctypes.c_void_p
    lib.prmtop_open.argtypes = [ctypes.c_char_p]
    lib.prmtop_close.argtypes = [ctypes.c_void_p]
    lib.prmtop_section_kind.restype = ctypes.c_int
    lib.prmtop_section_kind.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.prmtop_section_len.restype = ctypes.c_longlong
    lib.prmtop_section_len.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.prmtop_string_width.restype = ctypes.c_int
    lib.prmtop_string_width.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.prmtop_n_sections.restype = ctypes.c_longlong
    lib.prmtop_n_sections.argtypes = [ctypes.c_void_p]
    lib.prmtop_section_name.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                        ctypes.c_char_p]
    lib.prmtop_copy_longs.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_void_p]
    lib.prmtop_copy_doubles.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_void_p]
    lib.prmtop_copy_strings.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_void_p]
    _NATIVE_PRMTOP = lib
    return lib


def _parse_prmtop_native(lib, path: str) -> Dict[str, np.ndarray]:
    import ctypes

    h = lib.prmtop_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        out: Dict[str, np.ndarray] = {}
        n_sec = lib.prmtop_n_sections(h)
        buf = ctypes.create_string_buffer(128)
        for i in range(n_sec):
            lib.prmtop_section_name(h, i, buf)
            flag = buf.value.decode()
            kind = lib.prmtop_section_kind(h, flag.encode())
            n = lib.prmtop_section_len(h, flag.encode())
            if kind == 0:
                arr = np.empty(n, dtype=np.int64)
                lib.prmtop_copy_longs(h, flag.encode(),
                                      arr.ctypes.data_as(ctypes.c_void_p))
                out[flag] = arr
            elif kind == 1:
                arr = np.empty(n, dtype=np.float64)
                lib.prmtop_copy_doubles(h, flag.encode(),
                                        arr.ctypes.data_as(ctypes.c_void_p))
                out[flag] = arr
            elif kind == 2:
                w = lib.prmtop_string_width(h, flag.encode())
                raw = ctypes.create_string_buffer(int(n * w))
                lib.prmtop_copy_strings(h, flag.encode(), raw)
                text = raw.raw.decode("ascii", errors="replace")
                fields = [text[j:j + w].strip() for j in range(0, n * w, w)]
                out[flag] = np.asarray([f for f in fields if f])
        return out
    finally:
        lib.prmtop_close(h)


def parse_prmtop(path: str) -> Dict[str, np.ndarray]:
    """Parse a prmtop file into {FLAG: array} (raw, unconverted).

    Uses the native C++ parser (native/prmtop_parser.cpp, ~100x faster on
    20k-atom prmtops) when its shared library is present; falls back to the
    pure-Python fixed-width parser below."""
    lib = _native_prmtop_lib()
    if lib is not None:
        try:
            return _parse_prmtop_native(lib, path)
        except Exception:  # pragma: no cover - fallback guard
            pass
    sections: Dict[str, List[str]] = {}
    flag = None
    fmt_width = None
    fmt_kind = None
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("%FLAG"):
                flag = line.split()[1]
                sections[flag] = []
            elif line.startswith("%FORMAT"):
                m = re.search(r"\((\d+)([aIEFed])([\d.]+)", line)
                if m and flag is not None:
                    sections[flag + "__fmt"] = [m.group(2).lower(),
                                                m.group(3).split(".")[0]]
            elif line.startswith("%"):
                continue
            elif flag is not None:
                sections[flag].append(line)

    out: Dict[str, np.ndarray] = {}
    for flag, lines in sections.items():
        if flag.endswith("__fmt"):
            continue
        fmt = sections.get(flag + "__fmt", ["e", "16"])
        kind, width = fmt[0], int(fmt[1])
        raw = "".join(lines)
        fields = [raw[i:i + width] for i in range(0, len(raw), width)]
        fields = [f for f in fields if f.strip()]
        if kind == "a":
            out[flag] = np.asarray([f.strip() for f in fields])
        elif kind == "i":
            out[flag] = np.asarray([int(f) for f in fields], dtype=np.int64)
        else:
            out[flag] = np.asarray([float(f) for f in fields])
    return out


def parse_pdb_positions(path: str) -> np.ndarray:
    """Read coordinates (Å -> nm) from an ASCII PDB (ATOM/HETATM records)."""
    coords = []
    with open(path) as fh:
        for line in fh:
            if line.startswith(("ATOM", "HETATM")):
                coords.append((float(line[30:38]), float(line[38:46]),
                               float(line[46:54])))
    return np.asarray(coords) * A2NM


def parse_inpcrd(path: str, return_box: bool = False):
    """Parse an Amber .crd/.inpcrd restart: positions in Å -> nm.
    With ``return_box=True`` also returns the (3,) box lengths in nm (or
    None) read from the trailing box record."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    natoms = int(lines[1].split()[0])
    values: List[float] = []
    for line in lines[2:]:
        for i in range(0, len(line), 12):
            field = line[i:i + 12].strip()
            if field:
                values.append(float(field))
    coords = np.asarray(values[: natoms * 3]).reshape(natoms, 3) * A2NM
    if not return_box:
        return coords
    box = None
    # trailing record: 3 lengths (+ optionally 3 angles); only present when
    # there are extra values beyond the coordinates (and velocities)
    extra = values[natoms * 3:]
    if len(extra) >= 3:
        cand = extra[-6:] if len(extra) >= 6 else extra[-3:]
        if len(cand) == 6 and all(abs(a - 90.0) < 1e-3 for a in cand[3:]):
            box = np.asarray(cand[:3]) * A2NM
        elif len(cand) >= 3:
            box = np.asarray(cand[:3]) * A2NM
    return coords, box


def _f32(x):
    # numpy: System construction is pure-host (see models/testsystems.py _f32)
    return np.asarray(x, dtype=np.float32)


def create_system_from_prmtop(prmtop_path: str, constraints: Optional[str] = "h-bonds",
                              implicit_solvent: bool = False,
                              gb_model: str = "OBC2",
                              nonbonded_method: str = "no_cutoff",
                              cutoff: float = 0.9,
                              switch_width: Optional[float] = None,
                              ewald_error_tolerance: float = 5e-4) -> System:
    """Build a System from a prmtop (vacuum/implicit, or periodic with
    reaction-field / Ewald electrostatics via ``nonbonded_method`` in
    {'no_cutoff', 'cutoff_periodic', 'pme', 'ewald'}). Periodic systems read
    BOX_DIMENSIONS from the prmtop."""
    data = parse_prmtop(prmtop_path)
    ptr = data["POINTERS"]
    natom = int(ptr[0])
    ntypes = int(ptr[1])

    masses = data["MASS"][:natom]
    charges = data["CHARGE"][:natom] / AMBER_CHARGE
    type_idx = data["ATOM_TYPE_INDEX"][:natom].astype(np.int64) - 1
    nb_parm = data["NONBONDED_PARM_INDEX"].astype(np.int64)
    acoef = data["LENNARD_JONES_ACOEF"]
    bcoef = data["LENNARD_JONES_BCOEF"]

    # per-type sigma/epsilon from the diagonal of the type-pair tables
    sig_t = np.zeros(ntypes)
    eps_t = np.zeros(ntypes)
    for t in range(ntypes):
        j = nb_parm[ntypes * t + t] - 1
        if j < 0:
            continue
        a, b = acoef[j], bcoef[j]
        if b > 0 and a > 0:
            sig6 = a / b
            sig_t[t] = sig6 ** (1.0 / 6.0) * A2NM
            eps_t[t] = b * b / (4.0 * a) * KCAL
        else:
            sig_t[t] = 0.1  # dummy sigma for zero-LJ types
            eps_t[t] = 0.0
    sigmas = sig_t[type_idx]
    epsilons = eps_t[type_idx]

    # bonds ------------------------------------------------------------
    bond_k = data["BOND_FORCE_CONSTANT"] * 2.0 * KCAL / (A2NM * A2NM)
    bond_r0 = data["BOND_EQUIL_VALUE"] * A2NM

    def decode_bonds(flag):
        raw = data.get(flag, np.zeros(0, dtype=np.int64)).astype(np.int64)
        raw = raw.reshape(-1, 3)
        i = raw[:, 0] // 3
        j = raw[:, 1] // 3
        t = raw[:, 2] - 1
        return i, j, t

    bi_h, bj_h, bt_h = decode_bonds("BONDS_INC_HYDROGEN")
    bi, bj, bt = decode_bonds("BONDS_WITHOUT_HYDROGEN")

    constrain_h = constraints in ("h-bonds", "all-bonds")
    constrain_all = constraints == "all-bonds"
    c_idx, c_dist = [], []
    keep = {"i": [], "j": [], "t": []}
    for (ii, jj, tt), constrained in (((bi_h, bj_h, bt_h), constrain_h),
                                      ((bi, bj, bt), constrain_all)):
        for i_, j_, t_ in zip(ii, jj, tt):
            if constrained:
                c_idx.append((i_, j_))
                c_dist.append(bond_r0[t_])
            else:
                keep["i"].append(i_)
                keep["j"].append(j_)
                keep["t"].append(t_)
    bond_index = np.stack([keep["i"], keep["j"]], axis=1) if keep["i"] else \
        np.zeros((0, 2), dtype=np.int64)
    bond_terms = HarmonicBondTerm(
        index=np.asarray(bond_index, dtype=np.int32),
        length=_f32(bond_r0[keep["t"]] if keep["t"] else np.zeros(0)),
        k=_f32(bond_k[keep["t"]] if keep["t"] else np.zeros(0)))

    if c_idx:
        constraints_obj = Constraints(
            index=np.asarray(c_idx, dtype=np.int32),
            distance=_f32(np.asarray(c_dist)))
    else:
        constraints_obj = no_constraints()

    # angles -------------------------------------------------------------
    ang_k = data["ANGLE_FORCE_CONSTANT"] * 2.0 * KCAL
    ang_t0 = data["ANGLE_EQUIL_VALUE"]

    def decode_angles(flag):
        raw = data.get(flag, np.zeros(0, dtype=np.int64)).astype(np.int64)
        raw = raw.reshape(-1, 4)
        return raw[:, 0] // 3, raw[:, 1] // 3, raw[:, 2] // 3, raw[:, 3] - 1

    ai_h, aj_h, ak_h, at_h = decode_angles("ANGLES_INC_HYDROGEN")
    ai, aj, ak, at = decode_angles("ANGLES_WITHOUT_HYDROGEN")
    a_i = np.concatenate([ai_h, ai])
    a_j = np.concatenate([aj_h, aj])
    a_k = np.concatenate([ak_h, ak])
    a_t = np.concatenate([at_h, at])
    angle_terms = HarmonicAngleTerm(
        index=np.asarray(np.stack([a_i, a_j, a_k], axis=1), dtype=np.int32),
        angle=_f32(ang_t0[a_t]), k=_f32(ang_k[a_t]))

    # dihedrals ------------------------------------------------------------
    dih_k = data["DIHEDRAL_FORCE_CONSTANT"] * KCAL
    dih_per = data["DIHEDRAL_PERIODICITY"]
    dih_phase = data["DIHEDRAL_PHASE"]
    scee = data.get("SCEE_SCALE_FACTOR")
    scnb = data.get("SCNB_SCALE_FACTOR")

    def decode_dihedrals(flag):
        raw = data.get(flag, np.zeros(0, dtype=np.int64)).astype(np.int64)
        return raw.reshape(-1, 5)

    d_all = np.concatenate([decode_dihedrals("DIHEDRALS_INC_HYDROGEN"),
                            decode_dihedrals("DIHEDRALS_WITHOUT_HYDROGEN")],
                           axis=0) if natom else np.zeros((0, 5), np.int64)
    d_i = np.abs(d_all[:, 0]) // 3
    d_j = np.abs(d_all[:, 1]) // 3
    d_k_signed = d_all[:, 2]
    d_l_signed = d_all[:, 3]
    d_k = np.abs(d_k_signed) // 3
    d_l = np.abs(d_l_signed) // 3
    d_t = d_all[:, 4] - 1
    torsion_terms = PeriodicTorsionTerm(
        index=np.asarray(np.stack([d_i, d_j, d_k, d_l], axis=1),
                         dtype=np.int32),
        periodicity=_f32(np.abs(dih_per[d_t])),
        phase=_f32(dih_phase[d_t]),
        k=_f32(dih_k[d_t]))

    # exclusions and 1-4 exceptions ----------------------------------------
    # 1-2 (bonds incl. constrained) and 1-3 (angles) are fully excluded;
    # 1-4 pairs (dihedral terms with non-negative 3rd index) are scaled
    all_b_i = np.concatenate([bi_h, bi])
    all_b_j = np.concatenate([bj_h, bj])
    excl = set()
    for i_, j_ in zip(all_b_i, all_b_j):
        excl.add((min(i_, j_), max(i_, j_)))
    for i_, k_ in zip(a_i, a_k):
        excl.add((min(i_, k_), max(i_, k_)))

    pair14 = {}
    for row in range(d_all.shape[0]):
        if d_k_signed[row] < 0:  # 1-4 already counted by another torsion
            continue
        if d_l_signed[row] < 0:  # improper
            continue
        i_, l_ = int(d_i[row]), int(d_l[row])
        key = (min(i_, l_), max(i_, l_))
        if key in excl or key in pair14:
            continue
        t = int(d_t[row])
        scee_f = float(scee[t]) if scee is not None and scee[t] > 0 else 1.2
        scnb_f = float(scnb[t]) if scnb is not None and scnb[t] > 0 else 2.0
        pair14[key] = (scee_f, scnb_f)

    exc_index, exc_qq, exc_sig, exc_eps = [], [], [], []
    for (i_, j_) in sorted(excl):
        exc_index.append((i_, j_))
        exc_qq.append(0.0)
        exc_sig.append(0.1)
        exc_eps.append(0.0)
    for (i_, j_), (scee_f, scnb_f) in sorted(pair14.items()):
        exc_index.append((i_, j_))
        exc_qq.append(charges[i_] * charges[j_] / scee_f)
        exc_sig.append(0.5 * (sigmas[i_] + sigmas[j_]))
        exc_eps.append(np.sqrt(epsilons[i_] * epsilons[j_]) / scnb_f)

    periodic = nonbonded_method in ("cutoff_periodic", "pme", "ewald")
    default_box = None
    if periodic:
        if "BOX_DIMENSIONS" not in data:
            raise ValueError("periodic method requested but prmtop has no "
                             "BOX_DIMENSIONS")
        box_lengths = data["BOX_DIMENSIONS"][1:4] * A2NM  # [angle, a, b, c]
        default_box = np.diag(_f32(box_lengths))
    alpha = None
    if nonbonded_method in ("pme", "ewald"):
        from openmmtools_tpu.ops.pme import ewald_alpha

        alpha = float(ewald_alpha(cutoff, ewald_error_tolerance))
    exc_arr = np.asarray(exc_index, dtype=np.int64).reshape(-1, 2)
    nonbonded = NonbondedTerm(
        charge=_f32(charges), sigma=_f32(sigmas), epsilon=_f32(epsilons),
        exception_index=np.asarray(exc_arr, dtype=np.int32),
        exception_chargeprod=_f32(exc_qq),
        exception_sigma=_f32(exc_sig),
        exception_epsilon=_f32(exc_eps),
        method=nonbonded_method,
        cutoff=None if nonbonded_method == "no_cutoff" else cutoff,
        switch_width=switch_width,
        use_dispersion_correction=periodic,
        ewald_alpha=alpha)

    terms = [bond_terms, angle_terms, torsion_terms, nonbonded]
    if nonbonded_method in ("pme", "ewald"):
        from openmmtools_tpu.ops.pme import make_ewald_reciprocal_term

        terms.append(make_ewald_reciprocal_term(
            charges, float(np.max(box_lengths)), cutoff, exc_arr,
            tol=ewald_error_tolerance))
    if implicit_solvent:
        from openmmtools_tpu.ops.gbsa import GBSAOBCTerm

        if "RADII" not in data or "SCREEN" not in data:
            raise ValueError("prmtop lacks RADII/SCREEN for implicit solvent")
        from openmmtools_tpu.ops.gbsa import OBC1, OBC2

        model = gb_model.upper()
        if model not in ("HCT", "OBC1", "OBC2"):
            raise ValueError(f"unsupported gb_model {gb_model!r}; "
                             "available: HCT, OBC1, OBC2")
        a_, b_, g_ = OBC1 if model == "OBC1" else OBC2
        terms.append(GBSAOBCTerm(
            charge=_f32(charges),
            radius=_f32(data["RADII"][:natom] * A2NM),
            scale=_f32(data["SCREEN"][:natom]),
            obc_alpha=a_, obc_beta=b_, obc_gamma=g_,
            hct=(model == "HCT")))
    return System(
        masses=_f32(masses),
        terms=tuple(terms),
        constraints=constraints_obj,
        default_box=default_box,
        periodic=periodic)


class AmberTopology:
    """Minimal topology (atom/residue names) parsed from prmtop for
    selection purposes (the reference uses openmm.app/mdtraj topologies)."""

    def __init__(self, data: Dict[str, np.ndarray]):
        natom = int(data["POINTERS"][0])
        self.atom_names = list(data.get("ATOM_NAME", [])[:natom])
        res_labels = list(data.get("RESIDUE_LABEL", []))
        res_ptr = list(data.get("RESIDUE_POINTER", np.asarray([1]))
                       .astype(np.int64))
        self.residue_names = []
        self.residue_index = np.zeros(natom, dtype=np.int64)
        bounds = res_ptr + [natom + 1]
        for r in range(len(res_ptr)):
            lo, hi = bounds[r] - 1, bounds[r + 1] - 1
            self.residue_index[lo:hi] = r
            self.residue_names.append(res_labels[r] if r < len(res_labels)
                                      else "UNK")

    def select(self, expr=None, resname=None, name=None):
        """Atom selection: either keyword filters (``resname=``/``name=``)
        or an mdtraj-style expression string, e.g.
        ``select("protein and name CA")``,
        ``select("water or resname NA+")``,
        ``select("not hydrogen and resid 0 to 9")``.
        Returns sorted atom indices."""
        if expr is not None:
            return np.flatnonzero(_parse_selection(expr, self))
        idx = np.arange(len(self.atom_names))
        mask = np.ones(len(self.atom_names), dtype=bool)
        if resname is not None:
            rn = np.asarray([self.residue_names[r]
                             for r in self.residue_index])
            mask &= rn == resname
        if name is not None:
            mask &= np.asarray(self.atom_names) == name
        return idx[mask]


# -- mdtraj-style selection DSL ---------------------------------------------
# Recursive-descent parser over: and/or/not, parentheses, bare keywords
# (all, none, protein, water, backbone, sidechain, hydrogen, heavy) and
# field selectors (name/resname with one or more values; resid/index with
# values or "A to B" ranges). Replaces the reference's mdtraj dependency for
# the selection strings openmmtools passes around (e.g. forcefactories
# restrain_atoms 'protein and name CA').

_PROTEIN_RESIDUES = frozenset("""
    ALA ARG ASN ASP CYS CYX CYM GLN GLU GLY HIS HID HIE HIP ILE LEU LYS MET
    PHE PRO SER THR TRP TYR VAL ACE NME NMA ASH GLH LYN
""".split())
_WATER_RESIDUES = frozenset(["WAT", "HOH", "TIP3", "TP3", "TIP4", "TIP5",
                             "SPC", "SOL"])
_BACKBONE_NAMES = frozenset(["CA", "C", "N", "O", "OXT"])


class _SelTokens:
    def __init__(self, expr):
        import re

        self.toks = re.findall(r"\(|\)|[^\s()]+", expr)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of selection expression")
        self.pos += 1
        return t


def _parse_selection(expr, top: "AmberTopology"):
    n = len(top.atom_names)
    names = np.asarray(top.atom_names)
    resnames = np.asarray([top.residue_names[r] for r in top.residue_index])
    resid = top.residue_index
    index = np.arange(n)
    is_h = np.asarray([s.strip().upper().lstrip("0123456789").startswith("H")
                       for s in top.atom_names])
    keywords = {
        "all": np.ones(n, bool),
        "none": np.zeros(n, bool),
        "protein": np.isin(resnames, list(_PROTEIN_RESIDUES)),
        "water": np.isin(resnames, list(_WATER_RESIDUES)),
        "hydrogen": is_h,
        "heavy": ~is_h,
    }
    keywords["backbone"] = keywords["protein"] & np.isin(
        names, list(_BACKBONE_NAMES))
    keywords["sidechain"] = keywords["protein"] & ~np.isin(
        names, list(_BACKBONE_NAMES))
    stop_words = {"and", "or", "not", "(", ")", "to"}
    fields = {"name", "resname", "resid", "index", "resSeq"}

    tk = _SelTokens(expr)

    def parse_or():
        m = parse_and()
        while tk.peek() == "or":
            tk.next()
            m = m | parse_and()
        return m

    def parse_and():
        m = parse_not()
        while tk.peek() == "and":
            tk.next()
            m = m & parse_not()
        return m

    def parse_not():
        if tk.peek() == "not":
            tk.next()
            return ~parse_not()
        return parse_primary()

    def parse_primary():
        t = tk.next()
        if t == "(":
            m = parse_or()
            if tk.next() != ")":
                raise ValueError("unbalanced parentheses in selection")
            return m
        if t in keywords:
            return keywords[t]
        if t in fields:
            vals = []
            while tk.peek() is not None and tk.peek() not in stop_words \
                    and tk.peek() not in fields:
                vals.append(tk.next())
                if tk.peek() == "to":           # range: "resid 2 to 7"
                    tk.next()
                    hi = tk.next()
                    arr = resid if t in ("resid", "resSeq") else index
                    return (arr >= int(vals[-1])) & (arr <= int(hi))
            if not vals:
                raise ValueError(f"selection field {t!r} needs a value")
            if t in ("resid", "resSeq"):
                return np.isin(resid, [int(v) for v in vals])
            if t == "index":
                return np.isin(index, [int(v) for v in vals])
            arr = names if t == "name" else resnames
            return np.isin(arr, vals)
        raise ValueError(f"unknown selection token {t!r}")

    mask = parse_or()
    if tk.peek() is not None:
        raise ValueError(f"trailing tokens in selection: {tk.toks[tk.pos:]}")
    return mask
