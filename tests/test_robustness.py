"""Edge-case robustness: inputs that should not crash the pipeline."""

import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.mapper import Mapper
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def world(rng):
    genome = {"r1": random_dna(rng, 50_000)}
    return genome, ReferenceIndex.build(genome, k=15, w=10)


@pytest.mark.parametrize(
    "seq",
    [
        "",  # empty
        "ACGT",  # shorter than k
        "N" * 500,  # all ambiguous
        "ACGTN" * 100,  # riddled with Ns
    ],
)
def test_degenerate_reads_do_not_crash(world, seq):
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    assert m.map_read("x", seq) == []


def test_read_with_n_stretch_still_maps(world, rng):
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    frag = genome["r1"][10_000:16_000]
    read = frag[:3000] + "N" * 50 + frag[3050:]
    lines = m.map_read("n50", read)
    assert lines, "N stretch broke mapping"
    assert abs(int(lines[0].split("\t")[3]) - 10_001) < 100


def test_lowercase_read(world):
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    read = genome["r1"][5_000:9_000].lower()
    lines = m.map_read("lc", read)
    assert lines
    # SEQ emitted uppercase
    assert lines[0].split("\t")[9].isupper()


def test_mismatched_qual_dropped(world):
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    read = genome["r1"][5_000:9_000]
    lines = m.map_read("q", read, qual="III")  # wrong length
    assert lines
    assert lines[0].split("\t")[10] == "*"  # qual dropped, not crashed


def test_whole_genome_as_read(world):
    """A read equal to an entire contig (boundary clipping paths)."""
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    lines = m.map_read("whole", genome["r1"])
    assert lines
    f = lines[0].split("\t")
    assert int(f[3]) == 1


def test_read_longer_than_contig(world, rng):
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    read = random_dna(rng, 2000) + genome["r1"] + random_dna(rng, 2000)
    lines = m.map_read("over", read)
    assert lines
    f = lines[0].split("\t")
    assert f[5].count("S") >= 1  # ends clipped at contig boundary


def test_exact_tandem_repeat_read(world):
    """Highly repetitive read exercises the dense/fast-path branches."""
    genome, idx = world
    m = Mapper(idx, AlignerConfig(mode="H"))
    unit = genome["r1"][20_000:20_050]
    read = unit * 80  # 4 kb of 50 bp tandem repeat
    # must not crash or hang; may or may not align
    m.map_read("rep", read)
