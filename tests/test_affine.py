import numpy as np
import pytest

from vacmap_tpu.ops.affine_ref import align_strings, align2p
from vacmap_tpu.ops.edit import edit_distance, divergence_exceeds
from vacmap_tpu.seq import encode
from tests.conftest import random_dna


def scalar_align_score(t, q, match=2, mismatch=-4, o1=4, e1=2, o2=24, e2=1):
    """Unbanded scalar two-piece affine global score (independent check)."""
    T, Q = len(t), len(q)
    NEG = -10**9

    def gap(l):
        return min(o1 + e1 * l, o2 + e2 * l) if l > 0 else 0

    H = [[NEG] * (Q + 1) for _ in range(T + 1)]
    E1 = [[NEG] * (Q + 1) for _ in range(T + 1)]
    E2 = [[NEG] * (Q + 1) for _ in range(T + 1)]
    F1 = [[NEG] * (Q + 1) for _ in range(T + 1)]
    F2 = [[NEG] * (Q + 1) for _ in range(T + 1)]
    H[0][0] = 0
    for j in range(1, Q + 1):
        H[0][j] = -gap(j)
    for i in range(1, T + 1):
        H[i][0] = -gap(i)
    for i in range(1, T + 1):
        for j in range(1, Q + 1):
            E1[i][j] = max(E1[i - 1][j] - e1, H[i - 1][j] - o1 - e1)
            E2[i][j] = max(E2[i - 1][j] - e2, H[i - 1][j] - o2 - e2)
            F1[i][j] = max(F1[i][j - 1] - e1, H[i][j - 1] - o1 - e1)
            F2[i][j] = max(F2[i][j - 1] - e2, H[i][j - 1] - o2 - e2)
            s = match if t[i - 1] == q[j - 1] else mismatch
            H[i][j] = max(
                H[i - 1][j - 1] + s, E1[i][j], E2[i][j], F1[i][j], F2[i][j]
            )
    return H[T][Q]


def cigar_walk(cigar, t, q):
    """Validate a cigar consumes both sequences fully; return its score."""
    import re

    ti = qi = 0
    score = 0

    def gap2p(l):
        return min(4 + 2 * l, 24 + l)

    for m in re.finditer(r"(\d+)([MID=X])", cigar):
        ln, op = int(m.group(1)), m.group(2)
        if op in "M=X":
            for x in range(ln):
                score += 2 if t[ti + x] == q[qi + x] else -4
            ti += ln
            qi += ln
        elif op == "D":
            score -= gap2p(ln)
            ti += ln
        else:
            score -= gap2p(ln)
            qi += ln
    return ti, qi, score


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_global_score_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    t = random_dna(rng, 80)
    # mutate into q
    q = list(t)
    for _ in range(8):
        i = rng.integers(0, len(q))
        op = rng.integers(0, 3)
        if op == 0:
            q[i] = "ACGT"[rng.integers(0, 4)]
        elif op == 1 and len(q) > 10:
            del q[i]
        else:
            q.insert(i, "ACGT"[rng.integers(0, 4)])
    q = "".join(q)
    res = align_strings(t, q, bw=-1, zdrop=-1)
    expect = scalar_align_score(t, q)
    assert res.score == expect
    ti, qi, sc = cigar_walk(res.cigar, t, q)
    assert (ti, qi) == (len(t), len(q))
    assert sc == expect


def test_global_perfect_match():
    t = "ACGTACGTACGTACGTACGT"
    res = align_strings(t, t, bw=-1, zdrop=-1)
    assert res.cigar == f"{len(t)}M"
    assert res.score == 2 * len(t)
    assert res.n_del == 0 and res.n_ins == 0


def test_global_eqx():
    t = "ACGTACGT"
    q = "ACGAACGT"
    res = align_strings(t, q, bw=-1, zdrop=-1, eqx=True)
    assert res.cigar == "3=1X4="


def test_global_long_deletion_uses_piece2():
    rng = np.random.default_rng(7)
    left = random_dna(rng, 50)
    right = random_dna(rng, 50)
    dele = random_dna(rng, 100)
    t = left + dele + right
    q = left + right
    res = align_strings(t, q, bw=-1, zdrop=-1)
    assert f"100D" in res.cigar
    # deletion cost should be the piece-2 price: 24 + 100
    assert res.score == 2 * 100 - (24 + 100)


def test_extension_zdrop_stops(rng):
    common = random_dna(rng, 300)
    t = common + random_dna(rng, 300)
    q = common + random_dna(rng, 300)
    res = align_strings(
        t, q, gap_open_1=4, gap_extend_1=4, gap_open_2=4, gap_extend_2=4,
        bw=100, zdrop=50,
    )
    assert res.zdropped
    assert 250 <= res.q_end <= 350
    assert 250 <= res.t_end <= 350


def test_extension_full_match(rng):
    s = random_dna(rng, 500)
    res = align_strings(
        s, s, gap_open_1=4, gap_extend_1=4, gap_open_2=4, gap_extend_2=4,
        bw=100, zdrop=50,
    )
    assert not res.zdropped
    assert res.q_end == 500 and res.t_end == 500


def test_edit_distance_basic():
    a, b = encode("ACGT"), encode("AGGT")
    assert edit_distance(a, b) == 1
    assert edit_distance(encode("ACGT"), encode("ACGT")) == 0
    assert edit_distance(encode(""), encode("ACG")) == 3
    assert edit_distance(encode("KITTEN".replace("K", "A")), encode("ACG"), cap=2) == 3


def test_edit_distance_matches_dp(rng):
    def slow(a, b):
        n, m = len(a), len(b)
        D = np.zeros((n + 1, m + 1), np.int32)
        D[:, 0] = np.arange(n + 1)
        D[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = min(
                    D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                    D[i - 1, j] + 1,
                    D[i, j - 1] + 1,
                )
        return int(D[n, m])

    for _ in range(10):
        a = encode(random_dna(rng, int(rng.integers(5, 60))))
        b = encode(random_dna(rng, int(rng.integers(5, 60))))
        assert edit_distance(a, b) == slow(a, b)


def test_divergence_filter(rng):
    s = random_dna(rng, 400)
    assert not divergence_exceeds(encode(s), encode(s), 0.2)
    other = random_dna(rng, 400)
    assert divergence_exceeds(encode(s), encode(other), 0.2)


@pytest.mark.parametrize("mut_every", [97, 23, 11, 7, 5])
def test_divergence_window_bound_decision_parity(rng, mut_every):
    """The window-fill upper bound path (window_cache set) must make the
    SAME keep/drop decisions as the pure Myers ladder, across divergence
    levels including borderline ones where the bound cannot settle and
    falls through to Myers."""
    from vacmap_tpu.pipeline.extend import RefView, divergence_filter
    from vacmap_tpu.seq import revcomp_codes

    ref_codes = rng.integers(0, 4, 4000).astype(np.uint8)
    read = ref_codes[500:1500].copy()
    # scatter mismatches everywhere EXCEPT inside anchor spans
    anchors = [(0, 500, 1, 60), (200, 700, 1, 80), (500, 1000, 1, 70),
               (940, 1440, 1, 60)]
    protected = np.zeros(len(read), bool)
    for rp, _, _, ln in anchors:
        protected[rp : rp + ln] = True
    for p in range(0, len(read), mut_every):
        if not protected[p]:
            read[p] = (read[p] + 1) % 4
    for rp, gp, _, ln in anchors:  # anchors must stay exact matches
        assert np.array_equal(read[rp : rp + ln], ref_codes[gp : gp + ln])
    ref = RefView(ref_codes, np.array([0]), np.array([4000]), ["c"])
    seg = [tuple(map(int, a)) for a in anchors]
    rc = revcomp_codes(read)
    for ratio in (0.05, 0.1, 0.2):
        plain = divergence_filter([list(seg)], read, rc, len(read), ref,
                                  ratio, window_cache=None)
        cache = {}
        bounded = divergence_filter([list(seg)], read, rc, len(read), ref,
                                    ratio, window_cache=cache)
        assert (len(plain) == 1) == (len(bounded) == 1), (mut_every, ratio)
