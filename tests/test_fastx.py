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


def test_native_reader_matches_python(tmp_path):
    """The C (zlib) reader yields byte-identical records to the Python
    parser across FASTA/FASTQ, gzip, comments, multi-line and CRLF."""
    import gzip as _gz

    from vacmap_tpu import native
    from vacmap_tpu.io.fastx import fastx_read, _open, _read_fasta, _read_fastq

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")

    fa = tmp_path / "t.fa"
    fa.write_text(
        ">r1 a comment here\nACGTACGT\nTTTT\n>r2\nGGGG\n>empty\n>r3\t tabbed\nCCAA\n"
    )
    fq = tmp_path / "t.fq.gz"
    with _gz.open(fq, "wt") as f:
        f.write("@q1 c1\nACGT\n+\nIIII\n@q2\nGGTT\n+q2 junk\nJJJJ\n")
    crlf = tmp_path / "t2.fa"
    crlf.write_bytes(b">w1 x\r\nAC\r\nGT\r\n>w2\r\nTT\r\n")

    def python_read(path, rc):
        with _open(str(path)) as fh:
            first = fh.read(1)
            while first in ("\n", "\r", " "):
                first = fh.read(1)
            if first == ">":
                return list(_read_fasta(fh, rc))
            return list(_read_fastq(fh, rc))

    for path in (fa, fq, crlf):
        for rc in (False, True):
            nat = list(native.fastx_read_native(str(path), rc))
            py = python_read(path, rc)
            assert nat == py, (path, rc, nat, py)


def test_native_reader_record_larger_than_chunk(tmp_path):
    """A record bigger than the chunk buffer must survive the grow-retry:
    the reader used to return -2 without marking the parsed record
    pending, silently dropping any contig larger than the chunk (the
    default 8 MB — every real genome contig)."""
    from vacmap_tpu import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    big = "ACGT" * 2000  # 8 kb >> 1 kb chunk
    p = tmp_path / "big.fa"
    p.write_text(f">s1\nACGT\n>big\n{big}\n>s2\nGGCC\n")
    recs = list(native.fastx_read_native(str(p), False, chunk_bytes=1024))
    assert [(n, len(s)) for n, s in recs] == [("s1", 4), ("big", 8000),
                                             ("s2", 4)]
    assert recs[1][1] == big
