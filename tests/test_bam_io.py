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
