import gzip

from vacmap_tpu.io.fastx import fastx_read


def test_fasta(tmp_path):
    p = tmp_path / "a.fasta"
    p.write_text(">r1 some comment\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(fastx_read(str(p)))
    assert recs == [("r1", "ACGTACGT"), ("r2", "TTTT")]


def test_fasta_comments(tmp_path):
    p = tmp_path / "a.fasta"
    p.write_text(">r1 some comment\nACGT\n")
    recs = list(fastx_read(str(p), read_comment=True))
    assert recs == [("r1", "ACGT", None, "some comment")]


def test_fastq_gz(tmp_path):
    p = tmp_path / "a.fastq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2 c\nGGCC\n+\n!!!!\n")
    recs = list(fastx_read(str(p)))
    assert recs == [("r1", "ACGT", "IIII"), ("r2", "GGCC", "!!!!")]


def test_reference_testdata(testdata_dir):
    recs = list(fastx_read(testdata_dir + "/reference.fasta"))
    assert len(recs) == 1
    assert recs[0][0] == "chr1"
    assert len(recs[0][1]) == 29830
