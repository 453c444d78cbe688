"""Pallas fill kernel: exactness vs the host aligner, and the cross-read
aggregation service.

The kernel itself needs a real TPU (the CPU test mesh runs everything
else); on this suite's forced-CPU backend the device tests skip and the
aggregator is exercised against the host striped aligner instead.
A full on-hardware exactness run (2000+ real fill jobs, 100% CIGAR
match) is part of bench.py's device report.
"""

import numpy as np
import pytest

import jax

from vacmap_tpu import native
from vacmap_tpu.ops.affine_ref import AlignResult

on_tpu = jax.default_backend() not in ("cpu",)


def _mutpairs(rng, n, maxlen=250):
    pairs = []
    for _ in range(n):
        L = int(rng.integers(30, maxlen))
        t = rng.integers(0, 4, L).astype(np.uint8)
        q = t.copy()
        m = rng.random(L) < 0.08
        q[m] = rng.integers(0, 4, int(m.sum()))
        if rng.random() < 0.3 and L > 40:
            p = int(rng.integers(0, L - 20))
            q = np.concatenate([q[:p], rng.integers(0, 4, int(rng.integers(1, 12))).astype(np.uint8), q[p:]])
        pairs.append((t, q))
    return pairs


@pytest.mark.skipif(not on_tpu, reason="Pallas fill kernel needs a TPU")
def test_pallas_fill_exact_vs_host():
    from vacmap_tpu.ops.affine_pallas import PallasFillAligner

    rng = np.random.default_rng(5)
    pairs = _mutpairs(rng, 64)
    host = native.align2p_batch_native(pairs, eqx=True)
    dev = PallasFillAligner().align_batch(pairs, eqx=True)
    for d, h in zip(dev, host):
        assert d.cigar == native.ops_to_cigar(h)


class _HostBatchAligner:
    """host stand-in with the PallasFillAligner interface."""

    def align_batch(self, pairs, eqx=False):
        res = native.align2p_batch_native(pairs, eqx=eqx)
        return [
            AlignResult(native.ops_to_cigar(o), False, len(q), len(t), 0, 0, 0)
            for o, (t, q) in zip(res, pairs)
        ]


def test_aggregating_aligner_merges_and_slices():
    """Concurrent callers get exactly their own slices back, independent
    of aggregation batching."""
    import concurrent.futures

    from vacmap_tpu.parallel.device_service import AggregatingAligner

    rng = np.random.default_rng(6)
    agg = AggregatingAligner(_HostBatchAligner(), max_wait_ms=10.0)
    requests = [_mutpairs(rng, int(rng.integers(1, 9))) for _ in range(24)]
    expected = [
        [native.ops_to_cigar(o) for o in native.align2p_batch_native(p, eqx=True)]
        for p in requests
    ]
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        got = list(pool.map(lambda p: agg.align_batch(p, eqx=True), requests))
    for g, e in zip(got, expected):
        assert [r.cigar for r in g] == e
