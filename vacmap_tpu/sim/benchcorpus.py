"""The bench's SV-accuracy corpus, as a shared module.

bench.py publishes sv_recall/sv_precision for this repo AND for the
reference driver (tests/refshim — the real mammap_* pipeline pure-
Python) on the SAME reads; examples/sv_accuracy_anchor.py prints the
per-event breakdown.  Both must see byte-identical reads, so the corpus
generation lives here once.

Workload design (see bench.py round-3 notes): a 400 kb mostly-unique
genome with a realistic density of tandem arrays; events span mid-size
simple DEL/INS/INV/DUP, small (60-150 bp, near the 7%-error noise
floor) indels, and nested Random recipes — the reference's non-linear
chaining specialty (reference validation recipe:
/root/reference/vacsim/README.md:43-52).
"""

from __future__ import annotations

import numpy as np

_BASES = np.frombuffer(b"ACGT", np.uint8)

PARAMS = (
    "Specified{DEL:300:900;number=2}\n"
    "Specified{INS:300:900;number=2}\n"
    "Specified{INV:800:2000;number=2}\n"
    "Specified{DUP:400:900:0:1;number=2}\n"
    "Specified{DEL:60:150;number=3}\n"
    "Specified{INS:60:150;number=3}\n"
    "Random{eventset=['DEL:200:600,NML:100:300,INV:300:900',"
    "'INS:200:600,NML:100:300,DEL:200:600'];"
    "eventcount=[2,4];number=3}\n"
)
READ_LEN = 12_000
ERR = 0.07
READ_SEEDS = (99, 123)


def codes_to_str(codes):
    return _BASES[codes].tobytes().decode("ascii")


def mutate_codes(rng, codes, err):
    """ONT-like errors, vectorized: ~40% mismatch, 30% ins, 30% del.
    (Twin of bench.py's mutator; kept here so corpora are shared.)"""
    n = len(codes)
    r = rng.random(n)
    sub = r < err * 0.4
    ins = (r >= err * 0.4) & (r < err * 0.7)
    dele = (r >= err * 0.7) & (r < err)
    out = codes.copy()
    out[sub] = rng.integers(0, 4, int(sub.sum()), dtype=np.uint8)
    rep = np.ones(n, np.int64)
    rep[ins] = 2
    rep[dele] = 0
    expanded = np.repeat(out, rep)
    if ins.any():
        pos = np.cumsum(rep) - 1
        ins_slots = pos[ins]
        expanded[ins_slots] = rng.integers(
            0, 4, len(ins_slots), dtype=np.uint8)
    return expanded


def sv_genome():
    """The 400 kb SV-accuracy genome (deterministic)."""
    rng_sv = np.random.default_rng(99)
    svg = rng_sv.integers(0, 4, 400_000, dtype=np.uint8)
    for _ in range(8):
        unit = rng_sv.integers(
            0, 4, int(rng_sv.integers(300, 800)), dtype=np.uint8)
        arr = np.tile(unit, int(rng_sv.integers(8, 20)))
        st_ = int(rng_sv.integers(0, len(svg) - len(arr)))
        svg[st_: st_ + len(arr)] = arr
    return {"chrS": codes_to_str(svg)}


def sv_world():
    """(genome_dict, altered_dict, truth_rows) for the bench corpus."""
    from vacmap_tpu.sim.vacsim import simulate

    genome = sv_genome()
    altered, truth = simulate(PARAMS, genome, heterozygous_ratio=0.0,
                              seed=7)
    return genome, altered, truth


def sample_reads(alt: str, seed: int, coverage: int = 6):
    """The bench's read sample for one seed: [(name, read_str), ...]."""
    from vacmap_tpu.seq import encode, revcomp

    rl = READ_LEN
    n_r = max(1, coverage * len(alt) // rl)
    rng_r = np.random.default_rng(seed)
    reads = []
    for i in range(n_r):
        st = int(rng_r.integers(0, max(1, len(alt) - rl)))
        frag = encode(alt[st: st + rl])
        read = codes_to_str(mutate_codes(rng_r, frag, ERR))
        if rng_r.random() < 0.5:
            read = revcomp(read)
        reads.append((f"sv{i}", read))
    return reads
