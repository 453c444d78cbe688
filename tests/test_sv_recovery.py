"""End-to-end SV recovery: vacsim introduces SVs into a genome; reads
drawn from the altered genome are mapped back to the original reference;
the SV signatures (split/inverted/gapped alignments) must be recovered.

This is the framework's reason to exist: non-linear chaining keeps one
read's alignment intact across SV breakpoints.
"""

import re

import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.mapper import Mapper
from vacmap_tpu.sim.vacsim import simulate
from tests.conftest import random_dna


def big_indels(cigar, min_size=200):
    out = []
    for m in re.finditer(r"(\d+)([MIDNSHP=X])", cigar):
        ln, op = int(m.group(1)), m.group(2)
        if op in "DI" and ln >= min_size:
            out.append((op, ln))
    return out


@pytest.fixture(scope="module")
def sv_world(rng):
    genome = {"chrA": random_dna(rng, 300_000)}
    params = (
        "Specified{DEL:800:801;number=2}\n"
        "Specified{INS:700:701;number=2}\n"
        "Specified{INV:1500:1501;number=2}\n"
    )
    altered, truth = simulate(params, genome, heterozygous_ratio=0.0, seed=11)
    idx = ReferenceIndex.build(genome, k=15, w=10)
    return genome, altered, truth, idx


def reads_spanning(altered_seq, center, half=8000, rng=None):
    st = max(0, center - half)
    return altered_seq[st : center + half]


def alt_coord_of(truth, genome, altered, target):
    """Approximate position of a truth event in the ALTERED genome by
    accumulating length shifts of preceding events."""
    shift = 0
    for t in sorted(truth, key=lambda t: t[2]):
        if t[2] >= target[2]:
            break
        if t[0] == "DEL":
            shift -= t[3] - t[2]
        elif t[0] == "INS":
            shift += t[3]
    return target[2] + shift


def test_deletion_recovered(sv_world):
    genome, altered, truth, idx = sv_world
    cfg = AlignerConfig(mode="H")
    m = Mapper(idx, cfg)
    dels = [t for t in truth if t[0] == "DEL"]
    assert dels
    found = 0
    for ev in dels:
        c = alt_coord_of(truth, genome, altered, ev)
        read = reads_spanning(altered["chrA"], c)
        recs, _ = m.map_read_records("d", read)
        allcig = " ".join(r[8] for r in recs)
        if any(op == "D" and abs(ln - 800) < 120 for op, ln in big_indels(allcig)):
            found += 1
    assert found >= 1, f"deletions not recovered ({found}/{len(dels)})"


def test_insertion_recovered(sv_world):
    """A 700 bp insertion appears either as an I op or as a split: two
    records adjacent on the reference with a ~700 bp query gap (the
    segment-break rule at mammap_clrnano.py:23453 splits on readgap>=100,
    so large insertions are represented as splits)."""
    genome, altered, truth, idx = sv_world
    m = Mapper(idx, AlignerConfig(mode="H"))
    inss = [t for t in truth if t[0] == "INS"]
    assert inss
    found = 0
    for ev in inss:
        c = alt_coord_of(truth, genome, altered, ev)
        read = reads_spanning(altered["chrA"], c)
        recs, _ = m.map_read_records("i", read)
        allcig = " ".join(r[8] for r in recs)
        hit = any(
            op == "I" and abs(ln - 700) < 120 for op, ln in big_indels(allcig)
        )
        for a in recs:
            for b in recs:
                qgap = b[3] - a[4]
                rgap = abs(b[5] - a[6])
                if abs(qgap - 700) < 150 and rgap < 100:
                    hit = True
        if hit:
            found += 1
    assert found >= 1, f"insertions not recovered ({found}/{len(inss)})"


def test_inversion_recovered(sv_world):
    genome, altered, truth, idx = sv_world
    m = Mapper(idx, AlignerConfig(mode="H"))
    invs = [t for t in truth if t[0] == "INV"]
    assert invs
    found = 0
    for ev in invs:
        c = alt_coord_of(truth, genome, altered, ev)
        read = reads_spanning(altered["chrA"], c)
        recs, _ = m.map_read_records("v", read)
        strands = set(r[2] for r in recs)
        # an inversion splits the read into +/-/+ (or -/+/-) records
        if len(recs) >= 3 and strands == {"+", "-"}:
            found += 1
    assert found >= len(invs) // 2, f"inversions not recovered ({found}/{len(invs)})"


def test_translocation_recovered(rng):
    genome = {
        "t1": random_dna(rng, 120_000),
        "t2": random_dna(rng, 120_000),
    }
    idx = ReferenceIndex.build(genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="H"))
    # read stitched from two contigs: 8 kb of t1 then 8 kb of t2
    read = genome["t1"][30_000:38_000] + genome["t2"][70_000:78_000]
    recs, _ = m.map_read_records("tra", read)
    contigs = set(r[1] for r in recs)
    assert contigs == {"t1", "t2"}, f"split across contigs not found: {recs}"


def test_duplication_recovered(rng):
    """Tandem duplication: the read revisits the same reference interval,
    appearing as a query gap re-aligned to overlapping ref (split with
    backward ref jump) or a large insertion."""
    from vacmap_tpu.seq import revcomp

    genome = {"d1": random_dna(rng, 150_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="H"))
    st = 60_000
    seg = genome["d1"][st : st + 16_000]
    dup = seg[:7000] + seg[5000:7000] + seg[5000:7000] + seg[7000:]  # 2 extra copies of 2 kb
    recs, _ = m.map_read_records("dup", dup)
    assert recs
    hit = False
    for r in recs:
        for ln, op in big_indels(r[8], 500):
            if op == "I" and abs(ln - 4000) < 600:
                hit = True
    # or split signature: adjacent records with ref going backward
    recs.sort(key=lambda r: r[3])
    for a, b in zip(recs, recs[1:]):
        if a[2] == b[2] == "+" and b[5] < a[6] - 500:
            hit = True
    assert hit, recs


def test_reference_with_n_runs(rng):
    """Reference contigs containing N stretches must index and map."""
    g = random_dna(rng, 40_000) + "N" * 5_000 + random_dna(rng, 40_000)
    genome = {"n1": g}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="H"))
    read = g[50_000:58_000]  # after the N run
    lines = m.map_read("postn", read)
    assert lines
    assert abs(int(lines[0].split("\t")[3]) - 50_001) < 100
    # read spanning the N gap: maps around it
    read2 = g[38_000:52_000]
    m.map_read("spann", read2)  # must not crash
