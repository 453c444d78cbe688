"""Import the reference VACmap (at /root/reference) as pure Python.

The reference's hot loops are ``@njit`` numba functions whose Python
semantics are identical when the decorator is a no-op, so stubbing
numba (plus the other missing heavyweight deps) lets the REAL reference
code run as a differential oracle against this repo's implementations
(VERDICT.md next-step 5).  The stubs:

  * numba: identity njit/jit, typed.Dict/List as dict/list
  * edlib: align(task='distance') backed by this repo's exact Myers
  * vacmap_index (mp): k_cigar backed by this repo's native aligner
    (so glue-stage diffs isolate the reference's *driver* logic)
  * Bio.Seq / cigar / pysam / psutil: minimal functional stand-ins

Only the per-read pipeline stages are exercised — never the CLI or the
index (those need the real C extension).
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REF_SRC = "/root/reference/src"


def _identity_jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(f):
        return f

    return deco


class _TypedList(list):
    def __init__(self, it=()):
        super().__init__(it)


class _TypedDict(dict):
    @classmethod
    def empty(cls, *a, **k):
        return cls()


class _Seq(str):
    _COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")

    def reverse_complement(self):
        return _Seq(self.translate(self._COMP)[::-1])


class _Cigar:
    """Just enough of the `cigar` package: query-consumed length."""

    def __init__(self, s: str):
        self.s = s

    def __len__(self):
        import re

        n = 0
        for ln, op in re.findall(r"(\d+)([MIDNSHP=X])", self.s):
            if op in "MI=XSH":
                n += int(ln)
        return n

    def items(self):
        import re

        for ln, op in re.findall(r"(\d+)([MIDNSHP=X])", self.s):
            yield int(ln), op


def _edlib_align(query=None, target=None, task="distance", **kw):
    from vacmap_tpu import native
    from vacmap_tpu.seq import encode

    q = encode(str(query).upper())
    t = encode(str(target).upper())
    d = native.edit_distance_native(q, t, cap=-1)
    if d is None:
        from vacmap_tpu.ops.edit import edit_distance

        d = edit_distance(q, t)
    return {"editDistance": int(d)}


def _k_cigar(target, query, match=2, mismatch=-4, gap_open_1=4,
             gap_extend_1=2, gap_open_2=24, gap_extend_2=1, bw=-1,
             zdropvalue=-1, eqx=False):
    """mp.k_cigar stand-in backed by the repo's native aligner; the
    return tuple matches the reference call sites
    (mammap_clrnano.py:21554, :2381)."""
    from vacmap_tpu import native
    from vacmap_tpu.seq import encode

    t = encode(str(target).upper())
    q = encode(str(query).upper())
    res = native.align2p_native(
        t, q, match=match, mismatch=mismatch, o1=gap_open_1,
        e1=gap_extend_1, o2=gap_open_2, e2=gap_extend_2,
        bw=bw, zdrop=zdropvalue, eqx=bool(eqx),
    )
    if res is None:
        raise RuntimeError("native aligner unavailable for k_cigar shim")
    ops, q_end, t_end, score, zdropped = res
    cig = native.ops_to_cigar(ops)
    opc, lens = (ops[:, 0], ops[:, 1]) if len(ops) else (np.array([]), np.array([]))
    n_del = int(lens[opc == 2].sum()) if len(ops) else 0
    n_ins = int(lens[opc == 1].sum()) if len(ops) else 0
    return cig, (1 if zdropped else 0), q_end, t_end, n_del, n_ins


def install_stubs():
    if "numba" in sys.modules and hasattr(sys.modules["numba"], "_vacmap_stub"):
        return
    numba = types.ModuleType("numba")
    numba._vacmap_stub = True
    numba.njit = _identity_jit
    numba.jit = _identity_jit
    numba.prange = range
    typed = types.ModuleType("numba.typed")
    typed.List = _TypedList
    typed.Dict = _TypedDict
    numba.typed = typed
    sys.modules["numba"] = numba
    sys.modules["numba.typed"] = typed

    edlib = types.ModuleType("edlib")
    edlib.align = _edlib_align
    sys.modules["edlib"] = edlib

    mp = types.ModuleType("vacmap_index")
    mp.k_cigar = _k_cigar
    sys.modules["vacmap_index"] = mp

    bio = types.ModuleType("Bio")
    seqio = types.ModuleType("Bio.SeqIO")
    bioseq = types.ModuleType("Bio.Seq")
    bioseq.Seq = _Seq
    bio.SeqIO = seqio
    bio.Seq = bioseq
    sys.modules["Bio"] = bio
    sys.modules["Bio.SeqIO"] = seqio
    sys.modules["Bio.Seq"] = bioseq

    cigar_mod = types.ModuleType("cigar")
    cigar_mod.Cigar = _Cigar
    sys.modules["cigar"] = cigar_mod

    if "pysam" not in sys.modules:
        pysam = types.ModuleType("pysam")

        class _AlignedSegment:  # output layer only; never exercised here
            def __init__(self, *a, **k):
                raise RuntimeError("pysam stub")

        pysam.AlignedSegment = _AlignedSegment
        sys.modules["pysam"] = pysam


_ref_mods = {}


def load_reference(mode: str = "clrnano"):
    """Import and cache a reference mode module (clrnano/ccs/sensitive/
    noprefercloser/asm) from the reference tree."""
    if mode in _ref_mods:
        return _ref_mods[mode]
    install_stubs()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    import importlib

    m = importlib.import_module(f"vacmap.mammap_{mode}")
    _ref_mods[mode] = m
    return m
