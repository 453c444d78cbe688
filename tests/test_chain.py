import numpy as np
import pytest

from vacmap_tpu.ops.chain_ref import (
    EXTRA,
    NO_PRED,
    _EXTRA_MAX,
    _LOG2CACHE,
    _READGAPCOST,
    _gapcost_table,
    _large_readgapcost,
    _pair_geometry,
    chain_dp,
    chain_dp_fast,
    chain_local,
)
from vacmap_tpu.pipeline.chaining import chain_read, normalize_strand


def scalar_chain_dp(anchors, kmersize, skipcost, maxdiff, maxgap, variant):
    """Independent scalar transcription of the recurrence, with the
    reference's scan-order tie-break, used to validate the vectorized DP."""
    A = anchors.astype(np.int64)
    n = len(A)
    local = variant in ("fine", "mismatch")
    gapcost_list = _gapcost_table(kmersize, maxdiff, local)
    lrg = _large_readgapcost(maxgap) if variant == "mismatch" else None
    S = np.zeros(n)
    P = np.full(n, NO_PRED, np.int64)
    if variant == "global":
        cov = np.zeros(int(A[:, 0].max()) + 1, np.int64)
        for r in A[:, 0]:
            cov[r] = min(cov[r] + 1, 20)
    fixed_pen = np.zeros(n)
    pre_pen = np.zeros(n)
    barrier = A[:, 0] + (A[:, 3] if local else 0)
    for i in range(n):
        l_i = int(A[i, 3])
        best = float(l_i)
        pre = NO_PRED
        if variant == "global":
            skip_c = skipcost + cov[A[i, 0]]
            mdiff_c = max(maxdiff - cov[A[i, 0]], 10)
        else:
            skip_c, mdiff_c = skipcost, maxdiff
        cands = [j for j in range(i) if barrier[j] < barrier[i]]
        # scan order: descending S, ties by larger j
        cands.sort(key=lambda j: (S[j], j), reverse=True)
        for j in cands:
            rg, fg, bn, neg, same = _pair_geometry(A[i], A[j : j + 1])
            rg, fg, bn, neg, same = int(rg[0]), int(fg[0]), int(bn[0]), bool(neg[0]), bool(same[0])
            if local and neg and bn <= 0:
                continue
            gc = abs(rg - fg)
            colinear = same and fg >= 0 and rg <= maxgap and gc <= mdiff_c
            if colinear:
                ts = S[j] + bn - gapcost_list[gc]
                if variant == "fine":
                    ts -= _READGAPCOST[min(rg, 99)]
                elif variant == "mismatch":
                    ts -= lrg[min(rg, maxgap)]
                elif variant == "refund" and fixed_pen[j] < 0 and fixed_pen[j] + bn >= 0:
                    ts += pre_pen[j]
            else:
                if variant == "global":
                    ts = S[j] - skip_c + bn - EXTRA[min(gc, _EXTRA_MAX)]
                elif variant == "refund":
                    ts = S[j] + bn - skip_c
                elif variant == "fine":
                    pen = (skipcost if same else min(50.0, skipcost)) + EXTRA[min(gc, _EXTRA_MAX)]
                    ts = S[j] + bn - pen
                else:
                    ts = S[j] + bn - (skipcost + _LOG2CACHE[min(gc, 99999)])
            if ts > best:
                best, pre = ts, j
                if variant == "refund":
                    if colinear:
                        if fixed_pen[j] < 0 and fixed_pen[j] + bn < 0:
                            fixed_pen[i] = fixed_pen[j] + bn
                            pre_pen[i] = pre_pen[j]
                        else:
                            fixed_pen[i], pre_pen[i] = 0.0, 0.0
                    else:
                        fixed_pen[i] = -skip_c + bn
                        pre_pen[i] = skip_c
        S[i] = best
        P[i] = pre
    return S, P


def random_anchors(rng, n, read_len=2000, ref_len=100_000):
    r = np.sort(rng.integers(0, read_len, n))
    y = rng.integers(0, ref_len, n)
    s = rng.choice([-1, 1], n)
    l = rng.integers(9, 21, n)
    return np.stack([r, y, s, l], axis=1).astype(np.int64)


def chainy_anchors(rng, read_len=3000, step=40, diag=5000, noise=10):
    """Mostly-colinear anchors with jitter plus some random noise anchors."""
    r = np.arange(0, read_len - 20, step)
    y = r + diag + rng.integers(-3, 4, len(r))
    a = np.stack(
        [r, y, np.ones(len(r), np.int64), np.full(len(r), 15)], axis=1
    )
    noise_a = random_anchors(rng, noise, read_len)
    out = np.concatenate([a, noise_a])
    return out[np.argsort(out[:, 0], kind="stable")]


@pytest.mark.parametrize("variant", ["global", "refund", "fine", "mismatch"])
def test_vectorized_matches_scalar(rng, variant):
    for trial in range(5):
        a = random_anchors(rng, 60)
        if variant in ("fine", "mismatch"):
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        S1, P1 = scalar_chain_dp(a, 15, 40.0, 50, 1000, variant)
        res = chain_dp(a, 15, 40.0, 50, 1000, variant)
        np.testing.assert_allclose(res.S, S1, rtol=0, atol=1e-9)
        np.testing.assert_array_equal(res.P, P1)


def test_colinear_chain_links_everything(rng):
    a = chainy_anchors(rng, noise=0)
    res = chain_dp(a, 15, 40.0, 50, 1000, "global")
    # best chain ends at the last anchor and reaches back to the first
    i = res.g_max_index
    seen = []
    while i != NO_PRED:
        seen.append(i)
        i = int(res.P[i])
    assert len(seen) > len(a) * 0.9
    assert res.S[res.g_max_index] > 0.8 * a[:, 3].sum()


def test_inversion_chain_crosses_strands(rng):
    # + segment, - segment (inversion), + segment: one chain spans all three
    r1 = np.arange(0, 1000, 40)
    seg1 = np.stack([r1, r1 + 10_000, np.ones_like(r1), np.full_like(r1, 15)], 1)
    r2 = np.arange(1000, 2000, 40)
    # inverted block: read advances while ref decreases; leftmost-ref convention
    y2 = 13_000 - (r2 - 1000)
    seg2 = np.stack([r2, y2, -np.ones_like(r2), np.full_like(r2, 15)], 1)
    r3 = np.arange(2000, 3000, 40)
    seg3 = np.stack([r3, r3 + 10_000, np.ones_like(r3), np.full_like(r3, 15)], 1)
    a = np.concatenate([seg1, seg2, seg3])
    res = chain_dp(a, 15, 40.0, 50, 1000, "global")
    idxs = []
    i = res.g_max_index
    while i != NO_PRED:
        idxs.append(i)
        i = int(res.P[i])
    strands = set(a[idxs][:, 2].tolist())
    assert strands == {-1, 1}
    assert len(idxs) > 60


def test_refund_beats_plain_on_distant_translocation():
    # two colinear blocks 10 Mb apart: refund mode repays the jump penalty
    r1 = np.arange(0, 500, 40)
    b1 = np.stack([r1, r1 + 1000, np.ones_like(r1), np.full_like(r1, 15)], 1)
    r2 = np.arange(500, 1000, 40)
    b2 = np.stack([r2, r2 + 10_000_000, np.ones_like(r2), np.full_like(r2, 15)], 1)
    a = np.concatenate([b1, b2])
    plain = chain_dp(a, 15, 30.0, 50, 1000, "global")
    refund = chain_dp(a, 15, 30.0, 50, 1000, "refund")
    assert refund.S[refund.g_max_index] > plain.S[plain.g_max_index]


def test_fast_matches_exact_when_buckets_small(rng):
    # distinct-score anchors: every bucket has <= fast_t members, so the
    # bucketed DP prunes nothing and must agree with the exact DP
    a = chainy_anchors(rng, read_len=1200, step=37, noise=0)
    exact = chain_dp(a, 15, 40.0, 50, 1000, "global")
    fast = chain_dp_fast(a, 15, 40.0, 50, 1000, variant="global")
    assert fast.g_max_index == exact.g_max_index
    np.testing.assert_allclose(fast.S, exact.S, atol=1e-9)


def test_chain_local_overlap_trim():
    # two overlapping anchors on one diagonal: backtrack trims the overlap
    a = np.array([[0, 100, 1, 15], [10, 110, 1, 15]], np.int64)
    a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
    score, path = chain_local(a, kmersize=9, skipcost=40.0, maxdiff=30, maxgap=99)
    assert len(path) == 2
    # descending readpos; first entry trimmed so it starts at prev end
    assert path[0][0] == 15 and path[0][3] == 10
    assert path[1] == (0, 100, 1, 15)


def test_normalize_strand_flip():
    a = np.array(
        [[0, 100, -1, 15], [20, 80, -1, 15], [40, 60, -1, 15], [60, 500, 1, 15]],
        np.int64,
    )
    flipped, out = normalize_strand(a, 100)
    assert flipped
    assert (out[:, 2] == np.array([-1, 1, 1, 1])).all()
    # mirrored readpos: r' = 100 - r - len
    assert out[-1][0] == 100 - 0 - 15


def test_chain_read_end_to_end(rng):
    a = chainy_anchors(rng, read_len=3000, noise=15)
    gc = chain_read(
        a, 3000, kmersize=15, skipcost=40.0, maxdiff=50, accept_score=60.0
    )
    assert gc is not None
    assert gc.mapq == 60
    assert not gc.need_reverse
    assert len(gc.paths) >= 1
    best = gc.paths[0]
    assert best[0][0] > best[-1][0]  # descending readpos


def test_chain_read_rejects_weak(rng):
    a = random_anchors(rng, 20)
    gc = chain_read(a, 2000, kmersize=15, skipcost=40.0, maxdiff=50)
    assert gc is None or gc.score > 60


def test_prepare_read_anchors_sort_skip(rng):
    """The already-sorted fast path returns exactly what the stable sort
    would (including equal-readpos order)."""
    from vacmap_tpu.pipeline.chaining import prepare_read_anchors

    n = 500
    a_sorted = np.stack([
        np.sort(rng.integers(0, 200, n)),
        rng.integers(1, 10_000, n),
        np.where(rng.random(n) < 0.8, 1, -1),
        np.full(n, 15),
    ], axis=1).astype(np.int64)
    nr1, A1 = prepare_read_anchors(a_sorted, 2_000)
    order = np.argsort(a_sorted[:, 0], kind="stable")
    nr2, A2 = prepare_read_anchors(a_sorted[order], 2_000)
    assert nr1 == nr2
    assert np.array_equal(A1, A2)
    # shuffled input still lands on the same canonical order
    perm = rng.permutation(n)
    nr3, A3 = prepare_read_anchors(a_sorted[perm], 2_000)
    assert nr3 == nr1
    # equal-readpos groups may permute under shuffling (stable sort of a
    # different input order); the sorted keys must still agree
    assert np.array_equal(A3[:, 0], A1[:, 0])
