import numpy as np
import pytest

from vacmap_tpu import native
from vacmap_tpu.ops.affine_ref import align2p
from vacmap_tpu.ops.edit import edit_distance
from vacmap_tpu.seq import encode
from tests.conftest import random_dna
from tests.test_affine import cigar_walk

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_native_edit_distance_matches_python(rng):
    for _ in range(30):
        a = encode(random_dna(rng, int(rng.integers(1, 200))))
        b = encode(random_dna(rng, int(rng.integers(1, 200))))
        expect = edit_distance(a, b)
        got = native.edit_distance_native(a, b)
        assert got == expect, (len(a), len(b), got, expect)


def test_native_edit_distance_long(rng):
    s = random_dna(rng, 5000)
    a = encode(s)
    # 2% mutations
    b = list(s)
    for _ in range(100):
        b[int(rng.integers(0, len(b)))] = "ACGT"[rng.integers(0, 4)]
    b = encode("".join(b))
    d = native.edit_distance_native(a, b)
    assert 0 < d <= 100


def test_native_edit_distance_cap():
    a = encode("A" * 100)
    b = encode("T" * 100)
    assert native.edit_distance_native(a, b, cap=10) == 11


def test_native_align_matches_host_score(rng):
    from tests.test_affine import scalar_align_score

    for seed in range(6):
        r2 = np.random.default_rng(seed)
        t = random_dna(r2, 120)
        q = list(t)
        for _ in range(10):
            i = int(r2.integers(0, len(q)))
            op = int(r2.integers(0, 3))
            if op == 0:
                q[i] = "ACGT"[r2.integers(0, 4)]
            elif op == 1 and len(q) > 10:
                del q[i]
            else:
                q.insert(i, "ACGT"[r2.integers(0, 4)])
        q = "".join(q)
        te, qe = encode(t), encode(q)
        res = native.align2p_native(te, qe, bw=-1, zdrop=-1)
        assert res is not None
        ops, q_end, t_end, score, zd = res
        expect = scalar_align_score(t, q)
        assert score == expect
        cig = native.ops_to_cigar(ops)
        ti, qi, sc = cigar_walk(cig, t, q)
        assert (ti, qi) == (len(t), len(q))
        assert sc == expect


def test_native_extension_mode(rng):
    common = random_dna(rng, 400)
    t = encode(common + random_dna(rng, 300))
    q = encode(common + random_dna(rng, 300))
    res = native.align2p_native(
        t, q, o1=4, e1=4, o2=4, e2=4, bw=100, zdrop=50
    )
    ops, q_end, t_end, score, zd = res
    assert zd
    assert 350 <= q_end <= 450 and 350 <= t_end <= 450


@pytest.mark.parametrize("variant", ["global", "refund", "fine", "mismatch"])
def test_native_chain_matches_numpy(rng, variant):
    from vacmap_tpu.ops.chain_ref import chain_dp_numpy
    from tests.test_chain import random_anchors, chainy_anchors

    for maker in (lambda: random_anchors(rng, 70),
                  lambda: chainy_anchors(rng, read_len=1500, noise=8)):
        a = maker()
        if variant in ("fine", "mismatch"):
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        S, P, aborted = native.chain_dp_native(a, 15, 40.0, 50, 1000, variant)
        ref = chain_dp_numpy(a, 15, 40.0, 50, 1000, variant)
        np.testing.assert_allclose(S, ref.S, atol=1e-6)
        np.testing.assert_array_equal(P, ref.P)


def test_native_merge_diag_runs_matches_python(rng):
    from vacmap_tpu.ops.harvest import _merge_diagonal_runs

    for strand in (1, -1):
        for _ in range(5):
            n = int(rng.integers(5, 80))
            diag = np.sort(rng.integers(0, 4, n).astype(np.int64) * 1000)
            rpos = np.zeros(n, np.int64)
            for d in np.unique(diag):
                m = diag == d
                rpos[m] = np.sort(rng.integers(0, 60, m.sum()))
            order = np.lexsort((rpos, diag))
            rpos, diag = rpos[order], diag[order]
            refloc = (diag + rpos) if strand == 1 else (-diag - rpos)
            expect = _merge_diagonal_runs(rpos, refloc, diag, strand, 9)
            got = native.merge_diag_runs_native(rpos, refloc, diag, strand, 9)
            assert [tuple(x) for x in got.tolist()] == expect


def test_native_sketch_matches_numpy(rng):
    from vacmap_tpu.index.minimizer import minimizers
    from vacmap_tpu.seq import encode
    from tests.conftest import random_dna

    for n in (40, 500, 5000):
        s = random_dna(rng, n)
        # insert an ambiguous stretch
        s = s[: n // 2] + "NNN" + s[n // 2 :]
        codes = encode(s)
        got = native.minimizer_sketch_native(codes, 15, 10)
        # numpy path (force by building through internals)
        from vacmap_tpu.index import minimizer as mmod
        from vacmap_tpu.seq import kmer_codes, rc_kmer, hash64

        kmers, valid = kmer_codes(codes, 15)
        mask = (1 << 30) - 1
        fwd = hash64(kmers, mask)
        rev = hash64(rc_kmer(kmers, 15), mask)
        import numpy as np

        strand = np.where(fwd <= rev, np.int8(1), np.int8(-1))
        canon = np.minimum(fwd, rev)
        big = np.int64(np.iinfo(np.int64).max)
        keyed = np.where(valid & (fwd != rev), canon, big)
        if len(keyed) < 10:
            m = keyed.min()
            sel = np.flatnonzero(keyed == m) if m != big else np.empty(0, np.int64)
        else:
            sel = mmod.window_min_positions(keyed, 10)
        sel = sel[keyed[sel] != big]
        assert np.array_equal(got[1], sel), (n, len(got[1]), len(sel))
        assert np.array_equal(got[0], canon[sel])
        assert np.array_equal(got[2], strand[sel])


def test_native_edit_distance_fuzz_with_caps(rng):
    """Decision-exactness fuzz for the divergence filter (guards any
    future banded-Myers optimization)."""
    from vacmap_tpu.ops.edit import edit_distance

    for trial in range(60):
        n = int(rng.integers(100, 600))
        a = rng.integers(0, 4, n).astype(np.uint8)
        if trial % 2 == 0:
            b = a.copy()
            for _ in range(int(rng.integers(0, n // 4))):
                b[int(rng.integers(0, len(b)))] = rng.integers(0, 4)
        else:
            b = rng.integers(0, 4, int(rng.integers(100, 600))).astype(np.uint8)
        cap = int(rng.integers(5, 200))
        assert native.edit_distance_native(a, b, cap=cap) == edit_distance(
            a, b, cap=cap
        )


def test_native_harvest_matches_numpy(rng):
    """Full C++ harvest must reproduce the numpy harvest exactly
    (anchors as multisets; ordering differs only by emission order)."""
    from vacmap_tpu.ops import harvest as hmod
    from vacmap_tpu.seq import encode
    from tests.conftest import random_dna

    ref = random_dna(rng, 30_000)
    ref_codes = encode(ref)
    starts = np.array([0], np.int64)
    lens = np.array([len(ref)], np.int64)
    for trial in range(4):
        st = int(rng.integers(0, 20_000))
        frag = list(ref[st : st + 6000])
        for _ in range(240):
            frag[int(rng.integers(0, len(frag)))] = "ACGT"[rng.integers(0, 4)]
        read = "".join(frag) + random_dna(rng, 500)
        if trial % 2:
            from vacmap_tpu.seq import revcomp

            read = revcomp(read)
        read_codes = encode(read)
        from vacmap_tpu.seq import revcomp_codes

        rc = revcomp_codes(read_codes)
        # guide: coarse anchors on the true diagonal
        if trial % 2 == 0:
            g = np.array(
                [[i, st + i, 1, 15] for i in range(0, 6000, 500)], np.int64
            )
        else:
            L = len(read)
            g = np.array(
                [[L - (i + 15) - 500, st + i, -1, 15] for i in range(0, 6000, 500)],
                np.int64,
            )
        native_out = None
        numpy_out = None
        import vacmap_tpu.native as nat

        # numpy path: temporarily disable native
        real = nat.available
        try:
            nat.available = lambda: False
            numpy_out = hmod.harvest_anchors(
                g, read_codes, rc, ref_codes, starts, lens, kmersize=9
            )
        finally:
            nat.available = real
        native_out = hmod.harvest_anchors(
            g, read_codes, rc, ref_codes, starts, lens, kmersize=9
        )
        assert sorted(map(tuple, native_out)) == sorted(map(tuple, numpy_out)), trial


@pytest.mark.parametrize("variant", ["global", "refund", "fine", "mismatch"])
def test_native_fast_chain_matches_python(rng, variant):
    """C++ bucketed fast DP vs the scalar Python transcription, including
    dense same-score buckets that trigger the nearest-diagonal prune."""
    import vacmap_tpu.native as nat
    from vacmap_tpu.ops.chain_ref import chain_dp_fast
    from tests.test_chain import chainy_anchors, random_anchors

    for trial in range(3):
        a = np.concatenate([
            random_anchors(rng, 120),
            chainy_anchors(rng, read_len=1500, noise=0),
        ])
        a = a[np.argsort(a[:, 0], kind="stable")]
        if variant in ("fine", "mismatch"):
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        got = nat.chain_dp_fast_native(a, 15, 40.0, 50, 1000, variant)
        real = nat.available
        try:
            nat.available = lambda: False
            ref = chain_dp_fast(a, 15, 40.0, 50, 1000, variant=variant)
        finally:
            nat.available = real
        S, P = got
        # atol 1e-5: double-rounding/association differences between the
        # C++ and Python transcriptions surface on rare near-ties
        np.testing.assert_allclose(S, ref.S, atol=1e-5)
        agree = np.mean(P == ref.P)
        assert agree > 0.97, agree


def test_rebuild_chain_break_native_matches_python(rng):
    """C++ segmentation == python rebuild_chain_break, including the
    pop cascade at breaks and the dup-overlap anchor skip."""
    import vacmap_tpu.native as nat
    from vacmap_tpu.pipeline.extend import RefView, rebuild_chain_break

    if not nat.available():
        pytest.skip("native lib unavailable")
    starts = np.array([0, 500_000], np.int64)
    lens = np.array([500_000, 500_000], np.int64)
    rv = RefView(None, starts, lens, ["c1", "c2"])
    for trial in range(60):
        n = int(rng.integers(2, 80))
        rp = np.sort(rng.integers(0, 3000, n))
        strand = np.where(rng.random(n) < 0.8, 1, -1)
        y = rng.integers(100, 900_000, n)
        # make runs colinear-ish so segments actually form
        for i in range(1, n):
            if rng.random() < 0.7:
                strand[i] = strand[i - 1]
                y[i] = y[i - 1] + (rp[i] - rp[i - 1]) * strand[i - 1] + int(
                    rng.integers(-40, 40)
                )
        ln = rng.integers(9, 21, n)
        path = [(int(rp[i]), int(abs(y[i])), int(strand[i]), int(ln[i]))
                for i in range(n)]
        expect = rebuild_chain_break.__wrapped__(path, rv, 30) if hasattr(
            rebuild_chain_break, "__wrapped__") else None
        # compare native-backed vs pure-python (native disabled)
        got = rebuild_chain_break(path, rv, 30)
        real = nat.available
        try:
            nat.available = lambda: False
            ref_out = rebuild_chain_break(path, rv, 30)
        finally:
            nat.available = real
        assert got == ref_out, trial


def test_backtrack_all_native_matches_python(rng):
    """C++ multi-path backtrack == the python _backtrack_all on fuzzed
    S/P arrays (disjoint suffix paths, joined-prefix score deduction)."""
    import vacmap_tpu.native as nat
    from vacmap_tpu.ops.chain_ref import ChainResult
    from vacmap_tpu.pipeline import chaining

    if not nat.available():
        pytest.skip("native lib unavailable")
    for trial in range(50):
        n = int(rng.integers(3, 120))
        S = np.round(rng.random(n) * 300, 3)
        P = np.full(n, -1, np.int64)
        for i in range(1, n):
            if rng.random() < 0.8:
                P[i] = int(rng.integers(0, i))
        anchors = np.stack([
            np.arange(n), rng.integers(0, 10_000, n),
            np.ones(n, np.int64), np.full(n, 15),
        ], axis=1).astype(np.int64)
        res = ChainResult(int(np.argmax(S)), S.astype(np.float64), P)
        got = chaining._backtrack_all(anchors, res)
        real = nat.available
        try:
            nat.available = lambda: False
            exp = chaining._backtrack_all(anchors, res)
        finally:
            nat.available = real
        assert len(got[0]) == len(exp[0]), trial
        for a, b in zip(got[0], exp[0]):
            assert np.array_equal(a, b), trial
        assert np.allclose(got[1], exp[1]), trial
        assert np.allclose(got[2], exp[2]), trial


def test_striped_band_adversarial_vs_scalar(rng):
    """Banded striped batch vs the scalar full-width kernel on
    gap-dominated and mixed-size jobs (the offset-space band must cover
    single big indels by construction; local wander must escalate)."""
    from vacmap_tpu import native
    from vacmap_tpu.ops.affine_ref import align2p

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")

    def mut(t, err):
        q = t.copy()
        idx = rng.choice(len(t), int(err * len(t)), replace=False)
        q[idx] = (q[idx] + rng.integers(1, 4, len(idx))) % 4
        return q

    pairs = []
    for _ in range(3):
        # big deletion: t = left + gap + right, q = left + right
        left = rng.integers(0, 4, int(rng.integers(100, 400))).astype(np.uint8)
        gap = rng.integers(0, 4, int(rng.integers(800, 3000))).astype(np.uint8)
        right = rng.integers(0, 4, int(rng.integers(100, 400))).astype(np.uint8)
        pairs.append((np.concatenate([left, gap, right]),
                      mut(np.concatenate([left, right]), 0.08)))
        # big insertion (swapped)
        pairs.append((mut(np.concatenate([left, right]), 0.08),
                      np.concatenate([left, gap, right])))
    for _ in range(20):  # similar-size noisy pairs, various sizes
        n = int(rng.integers(50, 1500))
        t = rng.integers(0, 4, n).astype(np.uint8)
        pairs.append((t, mut(t, float(rng.uniform(0.02, 0.3)))))
    for _ in range(4):  # wildly asymmetric
        pairs.append((rng.integers(0, 4, int(rng.integers(2000, 3500))).astype(np.uint8),
                      rng.integers(0, 4, int(rng.integers(50, 300))).astype(np.uint8)))
    rng.shuffle(pairs)
    for eqx in (False, True):
        res = native.align2p_batch_native(pairs, eqx=eqx)
        cigs = native.ops_to_cigars_many(res)
        for (t, q), c in zip(pairs, cigs):
            want = align2p(t, q, match=2, mismatch=-4, gap_open_1=4,
                           gap_extend_1=2, gap_open_2=24, gap_extend_2=1,
                           bw=-1, zdrop=-1, eqx=eqx).cigar
            assert c == want, (len(t), len(q))


def test_myers_tight_band_asymmetric_fuzz(rng):
    """Both-endpoint band: value-exact for d <= cap across asymmetric
    lengths with |len diff| close to the cap (the band degenerates to
    width ~0 there) and assorted error rates."""
    from vacmap_tpu import native
    from vacmap_tpu.ops.edit import edit_distance

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    for _ in range(60):
        n = int(rng.integers(200, 4000))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = t.copy()
        err = float(rng.uniform(0.0, 0.5))
        k = int(err * n)
        if k:
            idx = rng.choice(n, k, replace=False)
            q[idx] = (q[idx] + rng.integers(1, 4, k)) % 4
        # random asymmetry: delete a block from one side
        if rng.random() < 0.7:
            cut = int(rng.integers(0, n // 2))
            st = int(rng.integers(0, n - cut)) if cut else 0
            if rng.random() < 0.5:
                t = np.concatenate([t[:st], t[st + cut:]])
            else:
                q = np.concatenate([q[:st], q[st + cut:]])
        base = abs(len(t) - len(q))
        for cap in (base + 2, base + 64, base + 300,
                    int(0.4 * min(len(t), len(q)))):
            if cap <= 0:
                continue
            d_native = native.edit_distance_native(t, q, cap=cap)
            d_ref = edit_distance(t, q, cap=cap)
            # both are (cap+1)-saturated exact values
            assert d_native == d_ref, (len(t), len(q), cap)
