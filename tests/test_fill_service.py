"""Async pipelined device fill service (parallel/fill_service.py).

The device kernel itself is exactness-tested in test_affine_pallas (on
hardware); here the host-emulation aligner (same packed traceback stream
contract) exercises the full service plumbing on CPU: transports,
cross-request batching, bucket routing, overflow fallbacks, the packed
decode, and the deferred-read pipeline built on top of it.
"""

import threading

import numpy as np
import pytest

from vacmap_tpu.ops.affine_ref import align2p
from vacmap_tpu.parallel.fill_service import (
    AsyncFillAligner,
    HostEmulFillAligner,
    pack_pairs,
    start_fill_server,
    unpack_pairs,
)
from vacmap_tpu.seq import encode


def _rand_pair(rng, lo=3, hi=400, mut=0.1):
    lt = int(rng.integers(lo, hi))
    t = rng.integers(0, 4, lt).astype(np.uint8)
    q = t.copy()
    nmut = int(len(q) * mut)
    if nmut:
        pos = rng.integers(0, len(q), nmut)
        q[pos] = (q[pos] + rng.integers(1, 4, nmut)) % 4
    if rng.random() < 0.3 and len(q) > 10:
        cut = int(rng.integers(1, len(q) // 2))
        q = q[:-cut] if rng.random() < 0.5 else q[cut:]
    return t, q


def _expected(pairs, eqx):
    return [
        align2p(t, q, match=2, mismatch=-4, gap_open_1=4, gap_extend_1=2,
                gap_open_2=24, gap_extend_2=1, bw=-1, zdrop=-1, eqx=eqx)
        for t, q in pairs
    ]


def test_pack_roundtrip(rng):
    pairs = [_rand_pair(rng) for _ in range(17)]
    lens, buf = pack_pairs(pairs)
    out = unpack_pairs(lens, buf)
    assert len(out) == len(pairs)
    for (t, q), (t2, q2) in zip(pairs, out):
        assert np.array_equal(t, t2) and np.array_equal(q, q2)


@pytest.mark.parametrize("eqx", [False, True])
def test_async_aligner_matches_host(rng, eqx):
    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=1.0)
    try:
        pairs = [_rand_pair(rng) for _ in range(40)]
        # oversize (falls to host inside decode) + empty-side jobs
        pairs.append((rng.integers(0, 4, 900).astype(np.uint8),
                      rng.integers(0, 4, 880).astype(np.uint8)))
        pairs.append((np.zeros(0, np.uint8), np.array([1, 2], np.uint8)))
        got = svc.align_batch(pairs, eqx=eqx)
        want = _expected(pairs, eqx)
        assert [g.cigar for g in got] == [w.cigar for w in want]
    finally:
        svc.stop()


def test_async_aligner_concurrent_requests(rng):
    """Many threads with requests in flight: per-request routing stays
    correct when the service mega-batches across them."""
    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=5.0)
    errs = []

    def one(seed):
        r = np.random.default_rng(seed)
        pairs = [_rand_pair(r) for _ in range(int(r.integers(1, 12)))]
        got = svc.align_batch(pairs, eqx=True)
        want = _expected(pairs, True)
        if [g.cigar for g in got] != [w.cigar for w in want]:
            errs.append(seed)

    try:
        threads = [threading.Thread(target=one, args=(s,)) for s in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs
    finally:
        svc.stop()


def test_submit_wait_out_of_order(rng):
    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=1.0)
    try:
        batches = [[_rand_pair(rng) for _ in range(5)] for _ in range(6)]
        handles = [svc.submit(b, eqx=False) for b in batches]
        for h, b in list(zip(handles, batches))[::-1]:  # reversed waits
            got = svc.wait(h)
            want = _expected(b, False)
            assert [g.cigar for g in got] == [w.cigar for w in want]
        assert svc.wait(svc.submit([], False)) == []
    finally:
        svc.stop()


def test_cross_process_server(rng, monkeypatch):
    monkeypatch.delenv("VACMAP_TPU_NO_FILL_SERVER", raising=False)
    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    handle = start_fill_server(2, prewarm=False)
    assert handle is not None
    try:
        c0, c1 = handle.client(0), handle.client(1)
        p0 = [_rand_pair(rng) for _ in range(9)]
        p1 = [_rand_pair(rng) for _ in range(7)]
        h0 = c0.submit(p0, eqx=True)
        h1 = c1.submit(p1, eqx=False)
        got0 = c0.wait(h0)
        got1 = c1.wait(h1)
        assert [g.cigar for g in got0] == [w.cigar for w in _expected(p0, True)]
        assert [g.cigar for g in got1] == [w.cigar for w in _expected(p1, False)]
    finally:
        handle.stop()


def test_no_accelerator_returns_none(monkeypatch):
    """On the CPU test backend (no FILL_HOST override) the server reports
    no usable accelerator and the CLI falls back to host fills."""
    monkeypatch.delenv("VACMAP_TPU_NO_FILL_SERVER", raising=False)
    monkeypatch.delenv("VACMAP_TPU_FILL_HOST", raising=False)
    assert start_fill_server(1, prewarm=False) is None


def test_deferred_mapper_matches_sync(small_genome, rng):
    """map_read_deferred + finish == map_read, record for record, when
    the async fill service is the global aligner."""
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.index import ReferenceIndex
    from vacmap_tpu.pipeline.mapper import Mapper, PendingLines

    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    cfg = AlignerConfig(mode="H")
    sync_mapper = Mapper(idx, cfg)

    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=1.0)
    async_mapper = Mapper(idx, cfg, global_aligner=svc)
    try:
        genome = small_genome["c1"]
        reads = []
        for i in range(6):
            st = int(rng.integers(0, len(genome) - 6000))
            frag = genome[st : st + 5000]
            if i % 2:
                # deletion SV: two distant windows spliced
                frag = frag[:2000] + genome[st + 3200 : st + 6000]
            reads.append((f"r{i}", frag))
        pendings = []
        for name, seq in reads:
            r = async_mapper.map_read_deferred(name, seq)
            pendings.append(r)
        for (name, seq), r in zip(reads, pendings):
            want = sync_mapper.map_read(name, seq)
            got = r.finish() if isinstance(r, PendingLines) else r
            assert got == want, name
    finally:
        svc.stop()


def test_edit_kind_stubbed_falls_back_to_host(monkeypatch, rng):
    """The edit job kind is PERMANENTLY STUBBED (round 5: the host
    stage it would replace measured ~zero production traffic since the
    window-bound pass; kernel lives in examples/myers_pallas_device.py).
    Clients must short-circuit edit_batch to all-None — the host ladder
    fallback — without a service round trip, and the pipeline's
    divergence decisions must be unaffected by an edit-capable-looking
    client."""
    from vacmap_tpu.parallel.fill_service import (
        AsyncFillAligner, HostEmulFillAligner,
    )

    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    al = AsyncFillAligner(aligner=HostEmulFillAligner(), prewarm=True)
    assert al.ready.wait(30)
    assert not al.core.edit_ready  # no edit kernel is ever live
    pairs = []
    for k in range(4):
        t = rng.integers(0, 4, int(rng.integers(40, 450))).astype(np.uint8)
        q = t.copy()
        q[::7] = (q[::7] + 1) % 4
        pairs.append((t, q))
    res = al.edit_batch(pairs)
    assert res == [None] * len(pairs)
    al.stop()


def test_ambiguous_code4_jobs_route_to_host(monkeypatch, rng):
    """Jobs containing ambiguous code 4 must host-fallback (the packed
    device upload is 2-bit) and still return exact results."""
    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    from vacmap_tpu.parallel.fill_service import (
        AsyncFillAligner, HostEmulFillAligner,
    )
    from vacmap_tpu.pipeline.extend import _host_global_batch

    al = AsyncFillAligner(aligner=HostEmulFillAligner(), prewarm=True)
    assert al.ready.wait(30)
    pairs = []
    for i in range(5):
        t = rng.integers(0, 4, 120 + i).astype(np.uint8)
        q = t.copy()
        q[::7] = (q[::7] + 1) % 4
        if i % 2:
            t[3] = 4  # ambiguous base
        pairs.append((t, q))
    res = al.align_batch(pairs, eqx=False)
    want = _host_global_batch(pairs, eqx=False)
    for r, w in zip(res, want):
        assert r.cigar == w.cigar  # service scores are placeholders
    al.stop()


def test_async_window_bound_stage_matches_sync(small_genome, rng):
    """Round-4 deployment: the divergence window-bound batch defers to
    the (service) aligner — the pipeline's largest fill block.  SAM
    lines, including divergence keep/drop DECISIONS on junk segments,
    must equal the synchronous host path; the window cigar cache must
    still serve the final fill stage (residual fill smaller than the
    full job list)."""
    from vacmap_tpu import trace
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.index import ReferenceIndex
    from vacmap_tpu.pipeline.mapper import Mapper, PendingLines

    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    cfg = AlignerConfig(mode="H")
    genome = small_genome["c1"]
    bases = "ACGT"
    reads = []
    for i in range(8):
        st = int(rng.integers(0, len(genome) - 9000))
        frag = genome[st : st + 4000]
        mid = genome[st + 4000 : st + 6000]
        if i % 2:
            # divergence-droppable middle: the real window is replaced
            # by random junk anchored with two short true flanks, so the
            # filter's keep/drop decision is load-bearing for this read
            junk = "".join(bases[int(rng.integers(4))]
                           for _ in range(1800))
            mid = mid[:100] + junk + mid[-100:]
        frag = frag + mid + genome[st + 6000 : st + 9000]
        reads.append((f"w{i}", frag))

    sync_mapper = Mapper(idx, cfg)
    want = [tuple(sync_mapper.map_read(n, s)) for n, s in reads]

    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=1.0)
    try:
        m = Mapper(idx, cfg, global_aligner=svc)
        trace.enable()
        trace.reset()
        pendings = [m.map_read_deferred(n, s) for n, s in reads]
        got = [tuple(r.finish() if isinstance(r, PendingLines) else r)
               for r in pendings]
        # the window stage actually engaged: the continuation's bound
        # derivation runs rf.diverg inside the refine_cont parent, and
        # the in-flight wait is its own top-level fill_wait span
        s = trace.summary()
        assert "rf.diverg" in s and "refine_cont" in s and "fill_wait" in s
        # round-5 invariant (VERDICT weak 5): no rf.* child may exceed
        # the sum of its possible parents (refine + refine_cont +
        # refine_redo) — the round-4 capture had rf.diverg at 157% of
        # the top-stage wall because continuation time had no parent
        totals = {}
        for line in s.splitlines()[1:]:
            parts = line.split()
            if len(parts) >= 5:
                totals[parts[0]] = float(parts[1])
        parent = (totals.get("refine", 0.0) + totals.get("refine_cont", 0.0)
                  + totals.get("refine_redo", 0.0))
        for k, v in totals.items():
            if k.startswith("rf."):
                assert v <= parent + 1e-6, (k, v, parent)
        trace.enable(False)
        trace.reset()
    finally:
        svc.stop()
    assert got == want


def test_backpressure_gate_bounces_to_host(rng, monkeypatch):
    """With the in-flight cap tiny, overload submits host-fill instead of
    queueing; accepted requests still resolve and the shared counter
    drains back to zero (cross-process transport)."""
    import vacmap_tpu.parallel.fill_service as fs

    monkeypatch.delenv("VACMAP_TPU_NO_FILL_SERVER", raising=False)
    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    monkeypatch.setattr(fs, "MAX_INFLIGHT_JOBS", 8)
    handle = start_fill_server(1, prewarm=False)
    assert handle is not None
    try:
        c = handle.client(0)
        batches = [[_rand_pair(rng) for _ in range(6)] for _ in range(5)]
        handles = [c.submit(b, eqx=True) for b in batches]
        # 8-job cap, 6-job batches: at most 2 admitted before any drain
        # (bounced submits return cross-read host-batch handles)
        assert sum(1 for h in handles if h[0] == "hostq") >= 3
        assert c.bounced_jobs >= 18
        for h, b in zip(handles, batches):
            got = c.wait(h)
            want = _expected(b, True)
            assert [g.cigar for g in got] == [w.cigar for w in want]
        # counter drains once every admitted response lands
        assert handle.pending_ctr.value == 0
    finally:
        handle.stop()


def test_backpressure_gate_in_process(rng, monkeypatch):
    import vacmap_tpu.parallel.fill_service as fs

    monkeypatch.setattr(fs, "MAX_INFLIGHT_JOBS", 8)
    svc = AsyncFillAligner(aligner=HostEmulFillAligner(), max_wait_ms=1.0)
    try:
        batches = [[_rand_pair(rng) for _ in range(6)] for _ in range(5)]
        handles = [svc.submit(b, eqx=False) for b in batches]
        assert sum(1 for h in handles if h[0] == "host") >= 3
        for h, b in zip(handles, batches):
            got = svc.wait(h)
            want = _expected(b, False)
            assert [g.cigar for g in got] == [w.cigar for w in want]
        assert svc._pending_n == 0
    finally:
        svc.stop()


_GEN_CLIENTS: list = []  # fork-inherited (mp queues cannot be pickled)


def _gen_chunk(args):
    """Top-level pool fn (fork ctx) for the two-generation test."""
    idx, seeds = args
    client = _GEN_CLIENTS[idx]
    r = np.random.default_rng(seeds)
    pairs = [_rand_pair(r) for _ in range(8)]
    got = client.align_batch(pairs, eqx=True)
    want = _expected(pairs, True)
    return [g.cigar for g in got] == [w.cigar for w in want]


def test_two_pool_generations_share_clients(rng, monkeypatch):
    """Two sequential fork-pool generations reuse the SAME clients (the
    bench's min-of-N pools; CLI re-runs).  A reader parked inside
    mp.Queue.get holds the queue's cross-process _rlock at worker exit,
    which deadlocked generation 2 before the poll-then-recv drain."""
    import multiprocessing as mp_

    monkeypatch.delenv("VACMAP_TPU_NO_FILL_SERVER", raising=False)
    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    handle = start_fill_server(2, prewarm=False)
    assert handle is not None
    try:
        _GEN_CLIENTS[:] = [handle.client(i) for i in range(2)]
        for gen in range(2):
            with mp_.get_context("fork").Pool(2) as pool:
                res = pool.map_async(
                    _gen_chunk,
                    [(i, 100 * gen + i) for i in range(2)])
                assert all(res.get(timeout=60)), f"generation {gen}"
    finally:
        _GEN_CLIENTS.clear()
        handle.stop()
