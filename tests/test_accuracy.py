"""Placement accuracy on simulated noisy reads: primary alignments must
land at the true locus with high MAPQ; reverse-strand reads must carry
flag 16 and map to the same locus."""

import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.mapper import Mapper
from vacmap_tpu.seq import revcomp
from tests.conftest import random_dna


def mutate(rng, s, err=0.08):
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.4:
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err * 0.7:
            out.append(ch)
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err:
            pass
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="module")
def acc_world(rng):
    genome = {"gA": random_dna(rng, 500_000), "gB": random_dna(rng, 300_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    return genome, idx


def test_placement_accuracy(acc_world, rng):
    genome, idx = acc_world
    m = Mapper(idx, AlignerConfig(mode="H"))
    n, correct, mapq_sum = 60, 0, 0
    for i in range(n):
        contig = "gA" if i % 2 == 0 else "gB"
        glen = len(genome[contig])
        st = int(rng.integers(0, glen - 5000))
        frag = mutate(rng, genome[contig][st : st + 5000])
        rev = i % 3 == 0
        read = revcomp(frag) if rev else frag
        lines = m.map_read(f"acc{i}", read)
        if not lines:
            continue
        primary = next(
            l for l in lines if int(l.split("\t")[1]) & 0x900 == 0
        )
        f = primary.split("\t")
        ok_pos = f[2] == contig and abs(int(f[3]) - 1 - st) < 200
        ok_strand = (int(f[1]) & 16 != 0) == rev
        if ok_pos and ok_strand:
            correct += 1
            mapq_sum += int(f[4])
    assert correct >= 0.95 * n, f"placement accuracy {correct}/{n}"
    assert mapq_sum / max(correct, 1) >= 50, "primary MAPQ too low"


def test_unmappable_read_rejected(acc_world, rng):
    _, idx = acc_world
    m = Mapper(idx, AlignerConfig(mode="H"))
    junk = random_dna(rng, 3000)
    lines = m.map_read("junk", junk)
    assert lines == []


def test_mapq_calibration_on_duplication(rng):
    """Reads inside a duplicated segment must get MAPQ ~0; reads anchored
    in unique flank must get high MAPQ (the f2/f1 term in hit2work's
    formula, mammap_clrnano.py:23704)."""
    seg = random_dna(rng, 25_000)
    genome = {
        "dup": random_dna(rng, 50_000) + seg + random_dna(rng, 100_000)
        + seg + random_dna(rng, 50_000)
    }
    idx = ReferenceIndex.build(genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="H"))
    amb = m.map_read("amb", seg[5_000:15_000])
    assert amb and int(amb[0].split("\t")[4]) <= 3
    uni = m.map_read("uni", genome["dup"][40_000:60_000])
    assert uni and int(uni[0].split("\t")[4]) >= 50
