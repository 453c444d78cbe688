import numpy as np
import pytest

from vacmap_tpu.ops.chain_jax import prepare_batch
from vacmap_tpu.ops.chain_pallas import (
    chain_scores_pallas_lm, pad_for_pallas_lm,
)
from vacmap_tpu.ops.chain_ref import chain_dp_numpy
from tests.test_chain import chainy_anchors, random_anchors


@pytest.mark.parametrize("variant", ["global", "fine"])
def test_pallas_lm_matches_oracle(rng, variant):
    """Lane-major kernel vs the float64 oracle (tolerance) and vs the
    f32 scan kernel (EXACT: same arithmetic, same tie-breaks)."""
    from vacmap_tpu.ops.chain_jax import chain_scores_batch

    alist = []
    for _ in range(3):
        a = random_anchors(rng, 60)
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
        ref = chain_dp_numpy(a, 15, 40.0, 50, 1000, variant)
        n = len(a)
        np.testing.assert_allclose(S[b, :n], ref.S, atol=2e-3, rtol=1e-6)
        assert np.mean(P[b, :n] == ref.P) > 0.95
        assert np.array_equal(P[b, :n], P2[b, :n]), "lane-major != scan"
        np.testing.assert_array_equal(S[b, :n], S2[b, :n])


def test_pallas_lm_chainy(rng):
    a = chainy_anchors(rng, read_len=1200, noise=6)
    prepared = prepare_batch([a], "global", 40.0, 50)
    at, nv, st, mt, B = pad_for_pallas_lm(*prepared)
    S, P = chain_scores_pallas_lm(at, nv, st, mt, interpret=True)
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
