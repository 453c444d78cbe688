import numpy as np
import pytest

from vacmap_tpu.ops.chain_jax import (
    JaxChainBackend,
    chain_scores_batch,
    prepare_batch,
)
from vacmap_tpu.ops.chain_ref import chain_dp
from tests.test_chain import chainy_anchors, random_anchors


def run_batch(anchor_list, variant, skipcost=40.0, maxdiff=50, maxgap=1000, k=15):
    anchors, n_valid, skip_i, maxdiff_i = prepare_batch(
        anchor_list, variant, skipcost, maxdiff
    )
    S, P = chain_scores_batch(
        anchors, n_valid, skip_i, maxdiff_i,
        kmersize=k, maxdiff=maxdiff, maxgap=maxgap, skipcost=skipcost,
        variant=variant,
    )
    return np.asarray(S), np.asarray(P)


@pytest.mark.parametrize("variant", ["global", "refund", "fine", "mismatch"])
def test_jax_matches_oracle(rng, variant):
    alist = []
    for _ in range(4):
        a = random_anchors(rng, 80)
        if variant in ("fine", "mismatch"):
            a = a[np.argsort(a[:, 0] + a[:, 3], kind="stable")]
        alist.append(a)
    S, P = run_batch(alist, variant)
    for b, a in enumerate(alist):
        ref = chain_dp(a, 15, 40.0, 50, 1000, variant)
        n = len(a)
        np.testing.assert_allclose(S[b, :n], ref.S, atol=2e-3, rtol=1e-6)
        # predecessors agree except where float32 rounding creates ties
        agree = np.mean(P[b, :n] == ref.P)
        assert agree > 0.97, f"P agreement {agree}"


def test_jax_chainy_exact(rng):
    a = chainy_anchors(rng, read_len=2000, noise=10)
    S, P = run_batch([a], "global")
    ref = chain_dp(a, 15, 40.0, 50, 1000, "global")
    n = len(a)
    np.testing.assert_allclose(S[0, :n], ref.S, atol=2e-3, rtol=1e-6)
    assert int(np.argmax(S[0, :n])) == ref.g_max_index


def test_jax_padding_irrelevant(rng):
    a = chainy_anchors(rng, read_len=1500, noise=5)
    b = chainy_anchors(rng, read_len=400, noise=2)
    S2, P2 = run_batch([a, b], "global")
    S1, _ = run_batch([b], "global")
    n = len(b)
    np.testing.assert_allclose(S2[1, :n], S1[0, :n], atol=1e-4)


def test_jax_backend_in_pipeline(rng):
    from vacmap_tpu.pipeline.chaining import chain_read

    a = chainy_anchors(rng, read_len=3000, noise=15)
    backend = JaxChainBackend()
    gc_dev = chain_read(
        a, 3000, kmersize=15, skipcost=40.0, maxdiff=50, accept_score=60.0,
        chain_backend=backend,
    )
    gc_host = chain_read(
        a, 3000, kmersize=15, skipcost=40.0, maxdiff=50, accept_score=60.0
    )
    assert gc_dev is not None and gc_host is not None
    assert gc_dev.mapq == gc_host.mapq
    assert abs(gc_dev.score - gc_host.score) < 0.01
    assert len(gc_dev.paths) == len(gc_host.paths)
    np.testing.assert_array_equal(gc_dev.paths[0], gc_host.paths[0])
