import numpy as np
import pytest

from vacmap_tpu.ops.chain_jax import prepare_batch
from vacmap_tpu.ops.chain_pallas import BB, chain_scores_pallas, pad_for_pallas
from vacmap_tpu.ops.chain_ref import chain_dp_numpy
from tests.test_chain import chainy_anchors, random_anchors


@pytest.mark.parametrize("variant", ["global", "fine"])
def test_pallas_matches_oracle(rng, variant):
    alist = []
    for _ in range(3):
        a = random_anchors(rng, 60)
        if variant == "fine":
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        alist.append(a)
    anchors, n_valid, skip_i, maxdiff_i = prepare_batch(alist, variant, 40.0, 50)
    anchors, n_valid, skip_i, maxdiff_i, B = pad_for_pallas(
        anchors, n_valid, skip_i, maxdiff_i
    )
    S, P = chain_scores_pallas(
        anchors, n_valid, skip_i, maxdiff_i,
        kmersize=15, maxdiff=50, maxgap=1000, skipcost=40.0,
        variant=variant, interpret=True,
    )
    S, P = np.asarray(S), np.asarray(P)
    # vs the float64 oracle: scores within f32 tolerance, predecessors
    # near-exact (ties can flip under f32).  vs the f32 SCAN kernel the
    # agreement must be EXACT — same arithmetic, same tie-breaks.
    from vacmap_tpu.ops.chain_jax import chain_scores_batch

    S2, P2 = chain_scores_batch(
        *prepare_batch(alist, variant, 40.0, 50),
        kmersize=15, maxdiff=50, maxgap=1000, skipcost=40.0,
        variant=variant,
    )
    S2, P2 = np.asarray(S2), np.asarray(P2)
    for b, a in enumerate(alist):
        ref = chain_dp_numpy(a, 15, 40.0, 50, 1000, variant)
        n = len(a)
        np.testing.assert_allclose(S[b, :n], ref.S, atol=2e-3, rtol=1e-6)
        agree = np.mean(P[b, :n] == ref.P)
        assert agree > 0.95
        assert np.array_equal(P[b, :n], P2[b, :n]), "pallas != scan kernel"
        np.testing.assert_array_equal(S[b, :n], S2[b, :n])


def test_pallas_chainy(rng):
    a = chainy_anchors(rng, read_len=1200, noise=6)
    anchors, n_valid, skip_i, maxdiff_i = prepare_batch([a], "global", 40.0, 50)
    anchors, n_valid, skip_i, maxdiff_i, B = pad_for_pallas(
        anchors, n_valid, skip_i, maxdiff_i
    )
    S, P = chain_scores_pallas(
        anchors, n_valid, skip_i, maxdiff_i, interpret=True
    )
    ref = chain_dp_numpy(a, 15, 40.0, 50, 1000, "global")
    n = len(a)
    assert int(np.argmax(np.asarray(S)[0, :n])) == ref.g_max_index


@pytest.mark.parametrize("variant", ["global", "fine"])
def test_pallas_lane_major_matches_scan(rng, variant):
    """Lane-major kernel: EXACT agreement with the f32 scan kernel."""
    from vacmap_tpu.ops.chain_jax import chain_scores_batch
    from vacmap_tpu.ops.chain_pallas import (
        chain_scores_pallas_lm, pad_for_pallas_lm,
    )

    alist = []
    for n in (60, 17, 88):
        a = random_anchors(rng, n)
        if variant == "fine":
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        alist.append(a)
    prepared = prepare_batch(alist, variant, 40.0, 50)
    at, nv, st, mt, B = pad_for_pallas_lm(*prepared)
    S, P = chain_scores_pallas_lm(
        at, nv, st, mt, kmersize=15, maxdiff=50, maxgap=1000,
        skipcost=40.0, variant=variant, interpret=True,
    )
    S, P = np.asarray(S)[:B], np.asarray(P)[:B]
    S2, P2 = chain_scores_batch(
        *prepared, kmersize=15, maxdiff=50, maxgap=1000, skipcost=40.0,
        variant=variant,
    )
    S2, P2 = np.asarray(S2), np.asarray(P2)
    for b, a in enumerate(alist):
        n = len(a)
        np.testing.assert_array_equal(S[b, :n], S2[b, :n])
        assert np.array_equal(P[b, :n], P2[b, :n]), "lane-major != scan"
