import numpy as np
import pytest

from vacmap_tpu.seq import encode, decode, revcomp, kmer_codes, rc_kmer
from vacmap_tpu.index import ReferenceIndex, minimizers
from tests.conftest import random_dna


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode(encode(s)) == s


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp(revcomp("GATTACA")) == "GATTACA"


def test_kmer_codes_match_manual():
    codes = encode("ACGTA")
    kmers, valid = kmer_codes(codes, 3)
    # ACG = 0b000110 = 6; CGT = 0b011011 = 27; GTA = 0b101100 = 44
    assert list(kmers) == [6, 27, 44]
    assert valid.all()


def test_kmer_codes_ambiguous():
    codes = encode("ACNTA")
    _, valid = kmer_codes(codes, 3)
    assert list(valid) == [False, False, False]


def test_rc_kmer_involution():
    codes = encode("ACGTACGTGG")
    kmers, _ = kmer_codes(codes, 5)
    assert np.array_equal(rc_kmer(rc_kmer(kmers, 5), 5), kmers)


def test_minimizers_strand_symmetry(rng):
    s = random_dna(rng, 2000)
    h1, p1, _ = minimizers(encode(s), 15, 10)
    h2, p2, _ = minimizers(encode(revcomp(s)), 15, 10)
    # canonical hashing: the sketch of the reverse complement selects the
    # same k-mers (positions mirrored)
    assert sorted(h1) == sorted(h2)
    mirrored = sorted(len(s) - 15 - p2)
    assert sorted(p1) == mirrored


def test_index_build_and_seeds_forward(small_genome):
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    read = small_genome["c1"][5000:8000]
    anchors = idx.seeds(read, check_num=100)
    plus = anchors[anchors[:, 2] == 1]
    diag = plus[:, 1] - plus[:, 0]
    on_diag = plus[diag == 5000]
    # merged anchors on the true diagonal should cover nearly the whole read
    assert on_diag[:, 3].sum() > 2500
    unmerged = idx.seeds(read, check_num=100, merge=False)
    assert len(unmerged) > 50


def test_index_seeds_reverse(small_genome):
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    read = revcomp(small_genome["c2"][2000:5000])
    anchors = idx.seeds(read, check_num=100)
    minus = anchors[anchors[:, 2] == -1]
    assert minus[:, 3].sum() > 2500
    c2_start = idx.start_of("c2")
    # anti-diagonal readpos+refpos+len should concentrate at one value
    anti = minus[:, 0] + minus[:, 1] + minus[:, 3]
    vals, counts = np.unique(anti, return_counts=True)
    top = vals[np.argmax(counts)]
    assert abs(top - (c2_start + 5000)) < 3


def test_index_save_load(tmp_path, small_genome):
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    path = str(tmp_path / "ref.vmi")
    idx.save(path)
    idx2 = ReferenceIndex.load(path)
    assert idx2.contig_names == idx.contig_names
    assert np.array_equal(idx2.mm_hash, idx.mm_hash)
    r = small_genome["c1"][100:1100]
    assert np.array_equal(idx.seeds(r), idx2.seeds(r))


def test_contig_of(small_genome):
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    assert idx.contig_of(0) == "c1"
    assert idx.contig_of(39_999) == "c1"
    assert idx.contig_of(40_000) == "c2"


def test_chunked_build_equivalence(rng):
    """Large contigs sketch in bounded-memory chunks; the chunked union +
    position dedup must select exactly the same minimizers."""
    import vacmap_tpu.index.index as ii

    g = random_dna(rng, 200_000)
    idx1 = ReferenceIndex.build({"c": g})
    ns = dict(ii.__dict__)
    src = open(ii.__file__).read()
    exec(src.replace("CHUNK = 16 << 20", "CHUNK = 37_000"), ns)
    idx2 = ns["ReferenceIndex"].build({"c": g})
    assert np.array_equal(idx1.mm_hash, idx2.mm_hash)
    assert np.array_equal(idx1.mm_pos, idx2.mm_pos)


def test_external_build_identical(tmp_path, rng):
    """External-sort (hash-radix) builder must produce a bit-identical
    index to the in-memory builder, for dict and streaming-iterator
    inputs, across chunk boundaries and N runs."""
    import shutil

    g1 = random_dna(rng, 260_000)
    g1 = g1[:40_000] + "N" * 29 + g1[40_029:]
    contigs = {"cA": g1, "cB": random_dna(rng, 90_000)}
    a = ReferenceIndex.build(contigs, k=15, w=10)
    for form in ("dict", "iter"):
        p = str(tmp_path / f"x_{form}.vmi")
        src = contigs if form == "dict" else iter(contigs.items())
        b = ReferenceIndex.build_external(src, p, k=15, w=10, chunk=75_000)
        assert b.contig_names == a.contig_names
        assert np.array_equal(np.asarray(b.seq_codes), a.seq_codes)
        assert b.mm_hash.dtype == a.mm_hash.dtype
        assert np.array_equal(np.asarray(b.mm_hash), a.mm_hash)
        assert np.array_equal(np.asarray(b.mm_pos), a.mm_pos)
        assert np.array_equal(np.asarray(b.mm_strand), a.mm_strand)
        assert b.occ_cutoff == a.occ_cutoff
        # no temp dir left behind; arrays memory-mapped
        assert not (tmp_path / f"x_{form}.vmi" / "_build_tmp").exists()
        read = g1[100_000:104_000]
        assert np.array_equal(a.seeds(read), b.seeds(read))
        shutil.rmtree(p)


def test_k19_hifi_path(tmp_path, rng):
    """-k 19 (HiFi preset territory): hash dtype widens to int64 and the
    whole pipeline still maps a deletion read; external builder agrees."""
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.pipeline.mapper import Mapper

    g = random_dna(rng, 200_000)
    idx = ReferenceIndex.build({"c": g}, k=19, w=10)
    assert idx.mm_hash.dtype == np.int64
    ext = ReferenceIndex.build_external(
        {"c": g}, str(tmp_path / "k19.vmi"), k=19, w=10, chunk=80_000
    )
    assert np.array_equal(np.asarray(ext.mm_hash), idx.mm_hash)
    assert np.array_equal(np.asarray(ext.mm_pos), idx.mm_pos)
    read = g[50_000:58_000] + g[60_000:66_000]
    recs, _ = Mapper(idx, AlignerConfig(mode="L", kmersize=19)).map_read_records(
        "r", read
    )
    assert recs and recs[0][5] == 50_000 and recs[0][6] == 66_000
    assert "2000D" in recs[0][8]


def test_native_sorted_builder_matches_numpy(rng):
    """C++ index_build_sorted (MT segmented sketch + bucket sort,
    vacmap_native.cpp) is bit-identical to the numpy argsort path —
    table order, dtypes, occ cutoff — across contig boundaries and Ns."""
    from vacmap_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    seqs = {}
    for i, n in enumerate((130_001, 64_321, 350, 90_007)):
        s = list(random_dna(rng, n))
        for _ in range(n // 9000 + 1):  # sprinkle N runs
            p = int(rng.integers(0, n - 20))
            for j in range(p, p + int(rng.integers(1, 12))):
                s[j] = "N"
        seqs[f"c{i}"] = "".join(s)
    a = ReferenceIndex.build(seqs, k=15, w=10)
    # numpy twin: disable the native builder AND the native sketch
    orig = ReferenceIndex._build_table_native
    av = native.available
    try:
        ReferenceIndex._build_table_native = staticmethod(lambda *x: None)
        native.available = lambda: False
        b = ReferenceIndex.build(seqs, k=15, w=10)
    finally:
        ReferenceIndex._build_table_native = orig
        native.available = av
    assert a.mm_hash.dtype == b.mm_hash.dtype
    assert a.mm_pos.dtype == b.mm_pos.dtype
    assert np.array_equal(a.mm_hash, b.mm_hash)
    assert np.array_equal(a.mm_pos, b.mm_pos)
    assert np.array_equal(a.mm_strand, b.mm_strand)
    assert a.occ_cutoff == b.occ_cutoff


def test_minimizer_sketch_mt_matches_st(rng):
    """Segment-parallel sketch selects exactly the single-thread set."""
    from vacmap_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    codes = encode(random_dna(rng, 2_000_000))
    st = native.minimizer_sketch_native(codes, 15, 10)
    for nthreads in (2, 3, 4, 7):
        mt = native.minimizer_sketch_mt_native(codes, 15, 10, nthreads)
        assert np.array_equal(st[0], mt[0])
        assert np.array_equal(st[1], mt[1])
        assert np.array_equal(st[2], mt[2])


def test_seeds_native_tail_matches_numpy(rng):
    """seeds_core (one-call C++ tail) vs the numpy path: bit-identical
    anchors across random + repeat-dense genomes, cutoffs and caps."""
    from vacmap_tpu import native
    from vacmap_tpu.seq import encode

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    b = "ACGT"
    g = rng.integers(0, 4, 300_000)
    seg = g[1000:3000].copy()
    for pos in (50_000, 120_000, 200_000):  # repeats stress the cap
        g[pos : pos + 2000] = seg
    gs = "".join(b[x] for x in g)
    idx = ReferenceIndex.build({"c1": gs[:150_000], "c2": gs[150_000:]},
                               k=15, w=10)
    assert idx.mm_hash.dtype == np.uint32

    def numpy_seeds(read, check_num, mid_occ):
        import vacmap_tpu.native as N
        lib = N._lib
        N._lib = None  # force the numpy path
        try:
            return idx.seeds(read, check_num=check_num, mid_occ=mid_occ)
        finally:
            N._lib = lib

    comp = str.maketrans("ACGT", "TGCA")
    for i in range(8):
        st = int(rng.integers(0, 280_000))
        ln = int(rng.integers(500, 12_000))
        rd = list(gs[st : st + ln])
        for _ in range(int(0.06 * ln)):
            pos = int(rng.integers(0, len(rd)))
            rd[pos] = b[int(rng.integers(0, 4))]
        read = "".join(rd)
        if i % 2:
            read = read.translate(comp)[::-1]
        for check_num, mid_occ in ((100, -1), (2, -1), (0, -1), (100, 3)):
            want = numpy_seeds(read, check_num, mid_occ)
            got = idx.seeds(read, check_num=check_num, mid_occ=mid_occ)
            assert np.array_equal(got, want), (i, check_num, mid_occ)


def test_index_load_in_ram_materializes(tmp_path, small_genome):
    """in_ram=True must produce REAL RAM copies (round-5 regression:
    np.ascontiguousarray is a no-op on an already-contiguous memmap, so
    genome-scale .vmi runs silently page-faulted tables from disk)."""
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    path = str(tmp_path / "ram.vmi")
    idx.save(path)
    hot = ReferenceIndex.load(path, in_ram=True)
    cold = ReferenceIndex.load(path, in_ram=False)
    for name in ("mm_hash", "mm_pos", "mm_strand", "seq_codes"):
        a_hot, a_cold = getattr(hot, name), getattr(cold, name)
        assert a_hot.flags.owndata and not isinstance(a_hot, np.memmap), name
        base = a_cold if isinstance(a_cold, np.memmap) else a_cold.base
        assert isinstance(base, np.memmap), name
        assert np.array_equal(a_hot, a_cold)
