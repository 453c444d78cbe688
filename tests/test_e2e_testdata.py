"""End-to-end golden test: the reference repo's install check
(README.md:121-124) — mapping testdata/read.fasta against
testdata/reference.fasta in mode S must yield exactly 3 alignments
(1 primary + 2 supplementary: the read contains structural variation)."""

import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.io.fastx import fastx_read
from vacmap_tpu.pipeline.mapper import Mapper


@pytest.fixture(scope="module")
def testdata(testdata_dir):
    ref = dict((r[0], r[1]) for r in fastx_read(testdata_dir + "/reference.fasta"))
    reads = list(fastx_read(testdata_dir + "/read.fasta"))
    return ref, reads


@pytest.fixture(scope="module")
def index(testdata):
    ref, _ = testdata
    return ReferenceIndex.build(ref, k=15, w=10)


def test_mode_s_three_alignments(index, testdata):
    _, reads = testdata
    cfg = AlignerConfig(mode="S")
    mapper = Mapper(index, cfg)
    name, seq = reads[0][0], reads[0][1]
    lines = mapper.map_read(name, seq)
    assert len(lines) == 3, f"expected 3 alignments, got {len(lines)}:\n" + "\n".join(
        l.split("\t")[0] + " flag=" + l.split("\t")[1] + " pos=" + l.split("\t")[3]
        + " cigar_len=" + str(len(l.split("\t")[5]))
        for l in lines
    )
    flags = sorted(int(l.split("\t")[1]) & ~16 for l in lines)
    assert flags == [0, 2048, 2048]


def test_records_consume_read(index, testdata):
    _, reads = testdata
    cfg = AlignerConfig(mode="S")
    mapper = Mapper(index, cfg)
    name, seq = reads[0][0], reads[0][1]
    records, _ = mapper.map_read_records(name, seq)
    assert len(records) == 3
    # every record's CIGAR spans the whole read with clips
    import re

    for rec in records:
        span = sum(
            int(m.group(1))
            for m in re.finditer(r"(\d+)([MIS=X])", rec[8])
        )
        assert span == len(seq)
