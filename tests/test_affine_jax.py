import numpy as np
import pytest

from vacmap_tpu.ops.affine_jax import BatchAligner
from vacmap_tpu.ops.affine_ref import align2p
from vacmap_tpu.seq import encode
from tests.conftest import random_dna
from tests.test_affine import cigar_walk


def mutate(rng, s, err=0.05):
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.4:
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err * 0.7:
            out.append(ch)
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err:
            pass
        else:
            out.append(ch)
    return "".join(out)


def test_global_batch_matches_host(rng):
    ba = BatchAligner(glob=True)
    pairs = []
    for _ in range(6):
        t = random_dna(rng, int(rng.integers(100, 900)))
        q = mutate(rng, t)
        pairs.append((encode(t), encode(q)))
    res = ba.align_batch(pairs)
    for (t, q), r in zip(pairs, res):
        host = align2p(t, q, bw=-1, zdrop=-1)
        ti, qi, sc = cigar_walk(
            r.cigar,
            "".join("ACGTN"[c] for c in t),
            "".join("ACGTN"[c] for c in q),
        )
        assert (ti, qi) == (len(t), len(q))
        # same optimal score (cigars may differ on equal-score paths)
        assert sc == host.score


def test_global_batch_eqx(rng):
    ba = BatchAligner(glob=True)
    t = encode("ACGTACGTACGT")
    q = encode("ACGTACCTACGT")
    r = ba.align_batch([(t, q)], eqx=True)[0]
    assert r.cigar == "6=1X5="


def test_extension_batch_matches_host(rng):
    ba = BatchAligner(o1=4, e1=4, o2=4, e2=4, zdrop=50, glob=False)
    pairs = []
    for _ in range(5):
        common = random_dna(rng, int(rng.integers(200, 1500)))
        t = common + random_dna(rng, 400)
        q = mutate(rng, common, 0.03) + random_dna(rng, 400)
        pairs.append((encode(t), encode(q)))
    res = ba.align_batch(pairs)
    for (t, q), r in zip(pairs, res):
        host = align2p(
            t, q, gap_open_1=4, gap_extend_1=4, gap_open_2=4, gap_extend_2=4,
            bw=100, zdrop=50,
        )
        # extension endpoints should land in the same region (band widths
        # differ slightly between host and device)
        assert abs(r.t_end - host.t_end) <= 50
        assert abs(r.q_end - host.q_end) <= 50


def test_fallback_on_large_length_diff(rng):
    ba = BatchAligner(glob=True)
    t = encode(random_dna(rng, 1000))
    q = encode(random_dna(rng, 400))
    r = ba.align_batch([(t, q)])[0]
    ti, qi, _ = cigar_walk(r.cigar, "N" * 1000, "N" * 400)
    assert (ti, qi) == (1000, 400)
