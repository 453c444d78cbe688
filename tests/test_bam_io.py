from vacmap_tpu.io.bam_reader import read_bam
from vacmap_tpu.io.sam_writer import OutputWriter
from vacmap_tpu.seq import revcomp


def test_bam_roundtrip(tmp_path):
    header = ["@HD\tVN:1.0", "@SQ\tSN:c1\tLN:1000"]
    path = str(tmp_path / "t.bam")
    w = OutputWriter(path, header)
    w.write_lines([
        "r1\t0\tc1\t1\t60\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:0",
        "r2\t16\tc1\t10\t60\t4M\t*\t0\t0\tTTCC\tIIHH\tNM:i:1",
        "r3\t2048\tc1\t20\t60\t4M\t*\t0\t0\tGGGG\tIIII",  # supplementary: skipped
    ])
    w.close()
    recs = list(read_bam(path))
    assert len(recs) == 2
    assert recs[0] == ("r1", "ACGT", "IIII")
    # reverse record restored to original read orientation
    assert recs[1] == ("r2", revcomp("TTCC"), "HHII")


def test_sorted_bam_with_bai(tmp_path):
    import os
    import struct

    header = ["@HD\tVN:1.0", "@SQ\tSN:c1\tLN:100000"]
    path = str(tmp_path / "s.sorted.bam")
    w = OutputWriter(path, header)
    # unsorted input; writer sorts by coordinate
    w.write_lines([
        "r2\t0\tc1\t50001\t60\t100M\t*\t0\t0\t" + "A" * 100 + "\t*",
        "r1\t0\tc1\t11\t60\t100M\t*\t0\t0\t" + "C" * 100 + "\t*",
    ])
    w.close()
    recs = list(read_bam(path))
    assert [r[0] for r in recs] == ["r1", "r2"]  # sorted order
    bai = path + ".bai"
    assert os.path.exists(bai)
    data = open(bai, "rb").read()
    assert data[:4] == b"BAI\x01"
    n_ref = struct.unpack("<i", data[4:8])[0]
    assert n_ref == 1


def test_sorted_bam_external_merge(tmp_path):
    """Native .sorted.bam spills sorted runs past spill_bytes and k-way
    merges them at close (reference: samtools sort external pipe,
    output_functions.py:202-208): many runs, exact global order."""
    import numpy as np

    header = ["@HD\tVN:1.0", "@SQ\tSN:c1\tLN:1000000", "@SQ\tSN:c2\tLN:1000000"]
    path = str(tmp_path / "m.sorted.bam")
    w = OutputWriter(path, header, spill_bytes=20_000)
    rng = np.random.default_rng(3)
    expect = []
    for i in range(2_000):
        contig = "c1" if rng.random() < 0.5 else "c2"
        pos = int(rng.integers(1, 900_000))
        w.write_lines([
            f"r{i}\t0\t{contig}\t{pos}\t60\t8M\t*\t0\t0\tACGTACGT\t*"
        ])
        expect.append((0 if contig == "c1" else 1, pos, f"r{i}"))
    assert len(w._runs) > 2, "spill should have produced multiple runs"
    w.close()
    recs = list(read_bam(path))
    key_of = {e[2]: (e[0], e[1]) for e in expect}
    got_keys = [key_of[r[0]] for r in recs]
    assert got_keys == sorted(got_keys), "output not in coordinate order"
    assert sorted(r[0] for r in recs) == sorted(e[2] for e in expect)
    import os

    assert os.path.exists(path + ".bai")
    assert not w._runs  # temp run files cleaned up


def test_bam_reader_streams_blocks(tmp_path):
    """The BAM reader never slurps the file: its BGZF layer yields blocks
    lazily and the record decoder works off a bounded rolling buffer."""
    header = ["@HD\tVN:1.0", "@SQ\tSN:c1\tLN:100000"]
    path = str(tmp_path / "big.bam")
    w = OutputWriter(path, header)
    seq = "ACGT" * 500
    for i in range(500):
        w.write_lines([f"q{i}\t0\tc1\t{1+i}\t60\t{len(seq)}M\t*\t0\t0\t{seq}\t*"])
    w.close()
    # partial consumption touches only a prefix of the stream
    it = read_bam(path)
    first = next(it)
    assert first[0] == "q0" and first[1] == seq
    n = sum(1 for _ in it) + 1
    assert n == 500
