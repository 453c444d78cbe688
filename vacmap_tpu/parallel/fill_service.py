"""Async pipelined device fill service (round-3 TPU deployment).

The reference's #1 hot native kernel is the per-gap global alignment
(`mp.k_cigar`, mammap_clrnano.py:21554).  Its device counterpart (the
Pallas fill kernel, ops/affine_pallas.py) is exact but the measured
round-2 deployment lost 8x to dispatch/download latency: every
aggregated call blocked all refinement threads for the ~40-60 ms
device->host fetch (parallel/device_service.py).

This module replaces that synchronous aggregator with a two-thread
pipeline so the device never waits for a download and the host never
waits for the device more than one batch period:

  collector/dispatcher thread:  drain request queue -> group jobs by
      length bucket -> pad -> jax dispatch (ASYNC: the call returns a
      device handle immediately) -> push handles into a bounded
      in-flight queue (depth 2 = double buffering)
  downloader thread:  pop handles -> np.asarray (the only blocking
      fetch; overlaps the dispatcher's next batch and the device's next
      compute) -> route packed 2-bit op columns back to each requester

CIGAR decode stays on the REQUESTER side (C++ decode_tb_ops): the
packed stream is 128 B/job, so responses are tiny and the service
process spends its core on padding + fetches only.

Two transports share the server core:

  * in-process (``AsyncFillAligner``): queue.Queue, for the
    single-process batched executor (--backend jax),
  * cross-process (``start_fill_server`` / ``FillClient``):
    multiprocessing queues, so the CLI's fork workers (the production
    host deployment, cli.py:345) all offload fills to ONE device-owning
    process — the TPU analog of the reference sharing its GPU across
    mapping processes.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (256, 512)
# ONE dispatch shape per length bucket: the Mosaic fill kernel compiles
# per (B, N) and a fresh compile is ~minutes on this platform, so the
# shape universe must be tiny, prewarmed before the service goes ready,
# and never grown by traffic (sub-full batches pad; over-full chunk)
DEFAULT_SHAPE_B = {256: 1024, 512: 256}
MAX_JOBS = 4096
# accumulation window: under sustained load the dispatcher batches up
# to this long (bigger calls amortize the per-call pad/dispatch CPU the
# service steals from the mapping cores — measured 4.4 ms/call at 55
# jobs/call on a fast relay); a quiescence check (no new request for
# ~4 ms) dispatches early so trickle traffic keeps low latency.
MAX_WAIT_MS = float(os.environ.get("VACMAP_TPU_FILL_WAIT_MS", "15.0"))
QUIESCENT_S = 0.004
# in-flight pipeline: depth 2 makes the batcher SELF-CLOCKING -- the
# dispatcher blocks on inflight.put while the device works, so incoming
# requests pile into ONE next batch (batch-while-busy): occupancy rises
# adaptively under load and latency stays one small window when idle.
# A deeper queue just serializes many small calls on the device.
# Concurrent fetches CONTEND rather than pipeline on the relay (measured:
# 3 downloader threads turned 32 ms/call into 99), so one downloader.
DEPTH = int(os.environ.get("VACMAP_TPU_FILL_DEPTH", "2"))
N_DOWNLOADERS = 1
# background ladder-rung compiles run only in traffic idle gaps: the
# relay serializes device calls per process, so a rung compile issued
# while fills are in flight parks every worker behind a minutes-long
# RPC (observed as the round-4 bench "deadlock": 4 workers futex-idle
# for >10 min while the service compiled rungs after going ready)
IDLE_COMPILE_S = float(os.environ.get("VACMAP_TPU_FILL_IDLE_COMPILE_S", "8"))
# adaptive partial offload: clients keep a SHARED count of jobs in
# flight to the service and submit only while it is below this cap —
# overflow jobs run on the host immediately instead of queueing behind
# a saturated link.  On a direct-attached chip the service drains fast,
# the cap never binds, and everything offloads; on a thin relay (~13k
# jobs/s measured here) the cap splits the fill load at the device's
# actual absorption rate instead of stalling every worker behind it.
MAX_INFLIGHT_JOBS = int(os.environ.get("VACMAP_TPU_FILL_MAX_INFLIGHT",
                                       "3072"))
# latency governor: clients keep an EMA of request round-trip time and
# stop admitting new work while it exceeds this bound.  The deferred
# window (32 reads x ~10 ms host work) hides ~300 ms of device latency;
# beyond that admitted reads stall their worker.  The job cap above
# bounds MEMORY/queue growth; this bounds WAITING — on a slow relay the
# EMA rises, submits divert to the host path, the backlog drains, and
# the EMA recovers (self-balancing partial offload).
MAX_LAT_S = float(os.environ.get("VACMAP_TPU_FILL_LAT_S", "0.25"))


# ---------------------------------------------------------------------------
# request/response packing (cross-process transport)
# ---------------------------------------------------------------------------


def pack_pairs(pairs: Sequence[Tuple[np.ndarray, np.ndarray]]):
    """(lens int32 (n,2), concat uint8 buffer) — one small message per
    request instead of 2n pickled arrays."""
    n = len(pairs)
    lens = np.empty((n, 2), np.int32)
    total = 0
    for i, (t, q) in enumerate(pairs):
        lens[i, 0] = len(t)
        lens[i, 1] = len(q)
        total += len(t) + len(q)
    buf = np.empty(total, np.uint8)
    off = 0
    for t, q in pairs:
        buf[off : off + len(t)] = t
        off += len(t)
        buf[off : off + len(q)] = q
        off += len(q)
    return lens, buf


def unpack_pairs(lens: np.ndarray, buf: np.ndarray):
    out = []
    off = 0
    for i in range(len(lens)):
        lt, lq = int(lens[i, 0]), int(lens[i, 1])
        out.append((buf[off : off + lt], buf[off + lt : off + lt + lq]))
        off += lt + lq
    return out


# ---------------------------------------------------------------------------
# server core (transport-agnostic)
# ---------------------------------------------------------------------------


class _ServerCore:
    """Collector/dispatcher + downloader pipeline around a device fill
    aligner exposing ``dispatch_padded(tT, tQ, t_len, q_len, bucket)``
    (async device handle) — see ops.affine_pallas.PallasFillAligner."""

    def __init__(self, aligner, buckets=DEFAULT_BUCKETS, depth=DEPTH,
                 max_jobs=MAX_JOBS, max_wait_ms=MAX_WAIT_MS, shape_b=None,
                 edit_aligner=None, force: bool = False, n_clients: int = 1,
                 edit_ready_cb=None):
        self.aligner = aligner
        self._edit_ready_cb = edit_ready_cb  # called when edit shapes land
        # calibrated auto (VERDICT round-2 item 1): offload pays only when
        # the device's best-case PIPELINED fill rate beats the whole
        # host's striped-kernel rate; measured at startup, not assumed.
        # force=True (--device-fills on / bench measurement) skips the gate.
        self.force = force
        self.n_clients = max(n_clients, 1)
        self.competitive = True
        self.calib = None  # (device_jobs_per_s, host_1core_jobs_per_s)
        # second job kind: exact edit distances (divergence filter) on
        # the Myers kernel; jobs bounce to the host ladder until its
        # shapes are compiled (see prewarm)
        self.edit_aligner = edit_aligner
        self.edit_ready: set = set()
        self.buckets = tuple(sorted(buckets))
        self.shape_b = dict(shape_b or DEFAULT_SHAPE_B)
        for b in self.buckets:  # every bucket needs a dispatch shape
            self.shape_b.setdefault(b, 256)
        # banded pseudo-buckets (round 4): band-eligible fill jobs route
        # to the banded kernel (T x 128 cells instead of T x T); jobs it
        # flags (band-edge escalation) bounce to the requester's host
        # fill path via the "host" slot
        self.band_ids = ()
        if getattr(aligner, "banded", False):
            from ..ops.affine_pallas import BANDED

            self.band_ids = tuple(b | BANDED for b in self.buckets)
            for bid in self.band_ids:
                self.shape_b.setdefault(bid, self.shape_b[bid & ~BANDED])
        self.max_jobs = max_jobs
        self.max_wait = max_wait_ms / 1e3
        self.inflight: "queue.Queue" = queue.Queue(maxsize=depth)
        self.stopping = False
        self.last_traffic = 0.0  # monotonic time of the last request seen
        self._stats_lock = threading.Lock()
        self._stats = {"calls": 0, "reqs": 0, "jobs": 0, "fetch_s": 0.0,
                       "disp_cpu": 0.0, "dl_cpu": 0.0, "escal": 0}
        # rungs whose compiles have landed (per bucket); the dispatcher
        # never dispatches a shape that would compile mid-traffic
        self.ready_rungs = {b: set() for b in self.buckets + self.band_ids}

    def _ladder(self, b: int):
        try:
            from ..ops.affine_pallas import batch_ladder

            return batch_ladder(b, self.shape_b[b])
        except Exception:  # host-emulation aligners: any shape works
            return [self.shape_b[b]]

    def prewarm(self):
        """Compile the top rung per bucket, then mark the service ready;
        the remaining ladder rungs compile on a background thread and the
        dispatcher adopts each as it lands (every relay round-trip before
        ready is mapping time the clients spend on host fills).

        Returns the calibrated go/no-go: False means the device cannot
        beat the host's own fill kernels on this attachment and the
        deployment should stay on host fills (unless forced)."""
        for b in self.band_ids + self.buckets:  # banded first: hot route
            self.aligner.prewarm(batch_sizes=(self.shape_b[b],),
                                 buckets=(b,))
            self.ready_rungs[b] = {self.shape_b[b]}
        if not self.force and not os.environ.get("VACMAP_TPU_FILL_HOST"):
            try:
                self.competitive = self._calibrate()
            except Exception:
                pass  # calibration is advisory; default stays engaged

        def _wait_idle() -> bool:
            """Block until no request arrived for IDLE_COMPILE_S (False =
            service stopping).  Keeps background rung compiles off the
            relay while fills are in flight — one rung compile issued
            mid-traffic parks every client behind a minutes-long RPC."""
            import time as _time

            while not self.stopping:
                if _time.monotonic() - self.last_traffic >= IDLE_COMPILE_S:
                    return True
                _time.sleep(0.5)
            return False

        def rest():
            try:
                for b in self.band_ids + self.buckets:
                    for r in self._ladder(b):
                        if r in self.ready_rungs[b]:
                            continue
                        if not _wait_idle():
                            return
                        self.aligner.prewarm(batch_sizes=(r,), buckets=(b,))
                        self.ready_rungs[b] = self.ready_rungs[b] | {r}
            except Exception:
                pass  # smaller rungs are an optimization only
            ea = self.edit_aligner
            if ea is not None:
                for bk in ea.buckets:
                    try:
                        if not _wait_idle():
                            return
                        ea.prewarm(buckets=(bk,))
                        self.edit_ready = self.edit_ready | {bk}
                        if self._edit_ready_cb is not None:
                            self._edit_ready_cb()
                    except Exception:
                        pass  # edit offload is an optimization only

        threading.Thread(target=rest, daemon=True).start()

    def _calibrate(self) -> bool:
        """Measured go/no-go for the offload (runs once, ~0.2 s warm).

        Measures the device's best-case PIPELINED fill rate (back-to-back
        dispatches, fetches at the end — latency fully hidden, the upper
        bound of any deployment) against the host striped kernel's
        single-core rate on the same jobs.  Offload frees worker fill
        time only if the device absorbs the whole host's fill demand, so
        the bar is host_1core x n_clients (x0.75 margin: service-side
        padding/decode CPU is stolen from the same cores).  Measured on
        the round-3 bench box (4 cores + relay-attached v5e): device
        52k jobs/s best-case vs host 100k/core — offload lost 9.4x e2e;
        this gate turns that deployment off automatically."""
        import time as _time

        from .. import native

        # calibrate the PRODUCTION route: banded when available
        b_id = self.band_ids[0] if self.band_ids else self.buckets[0]
        b = b_id & 0xFFFFF
        B = self.shape_b[b_id]  # the top rung compiled just above
        n = max(b * 3 // 4, 16)
        rng = np.random.default_rng(0)
        t_plane = rng.integers(0, 4, (B, b)).astype(np.uint8)
        q_plane = t_plane.copy()
        m = rng.random((B, b)) < 0.05
        q_plane[m] = rng.integers(0, 4, int(m.sum())).astype(np.uint8)
        t_plane[:, n:] = 4
        q_plane[:, n:] = 4
        lens = np.full(B, n, np.int32)

        def dispatch():
            try:
                return self.aligner.dispatch_padded(
                    t_plane, q_plane, lens, lens, b_id, n_used=B)
            except TypeError:
                return self.aligner.dispatch_padded(
                    t_plane, q_plane, lens, lens, b_id)

        fetch = getattr(self.aligner, "fetch", np.asarray)
        fetch(dispatch())  # warm
        t0 = _time.monotonic()
        hs = [dispatch() for _ in range(4)]
        for h in hs:
            fetch(h)
        dev_rate = 4 * B / max(_time.monotonic() - t0, 1e-9)
        jobs = [(t_plane[i, :n], q_plane[i, :n]) for i in range(min(B, 256))]
        t0 = _time.monotonic()
        host_res = native.align2p_batch_native(jobs, eqx=False)
        host_rate = len(jobs) / max(_time.monotonic() - t0, 1e-9)
        self.calib = (dev_rate, host_rate)
        if host_res is None:
            return True  # no native lib: host fills are the slow oracle
        return dev_rate > host_rate * self.n_clients * 0.75

    def bucket_of(self, lt: int, lq: int) -> int:
        mx = lt if lt > lq else lq
        for b in self.buckets:
            if mx <= b:
                return b
        return -1

    # -- dispatcher ----------------------------------------------------
    def run_dispatch(self, req_get, resp_put):
        """req_get(timeout) -> (client_id, req_id, lens, buf) | None(stop)
        resp_put(client_id, msg).  Blocks until stop sentinel."""
        import time

        pending = []  # (client_id, req_id, lens, buf)
        while True:
            # wait for at least one request (or stop)
            try:
                item = req_get(0.05)
            except queue.Empty:
                continue
            if item is None:
                break
            pending.append(item)
            # accumulation window: let peers pile on (quiescence check:
            # dispatch early when no new request arrives for a while)
            self.last_traffic = time.monotonic()
            deadline = time.monotonic() + self.max_wait
            last_new = time.monotonic()
            njobs = len(pending[0][2])
            stop = False
            while njobs < self.max_jobs and time.monotonic() < deadline:
                try:
                    item = req_get(0.002)
                except queue.Empty:
                    if time.monotonic() - last_new >= QUIESCENT_S:
                        break
                    continue
                if item is None:
                    stop = True
                    break
                pending.append(item)
                last_new = time.monotonic()
                njobs += len(item[2])
            self.last_traffic = time.monotonic()
            self._dispatch_batch(pending, resp_put)
            pending = []
            if stop:
                break
        # drain the in-flight queue, then wake the downloader
        self.stopping = True
        self.inflight.put(None)

    def _dispatch_batch(self, pending, resp_put):
        """Exception-proof wrapper: a dispatch failure (bad request, relay
        error, device OOM) must degrade THAT batch to host fills — loudly
        — never kill the dispatcher thread (clients would hang forever)."""
        try:
            self._dispatch_batch_inner(pending, resp_put)
        except Exception:
            import sys
            import traceback

            print("vacmap fill service: dispatch failed; batch degraded "
                  "to host fills:\n" + traceback.format_exc(limit=6),
                  file=sys.stderr, flush=True)
            for p in pending:
                client_id, req_id, lens = p[0], p[1], p[2]
                try:
                    resp_put(client_id, (
                        req_id, {(-1, 0): ("host", list(range(len(lens))))}))
                except Exception:
                    pass

    def _dispatch_batch_inner(self, pending, resp_put):
        """Flatten requests -> bucket groups -> padded device dispatches.

        Fully vectorized (bulk numpy over the concatenated request
        buffers, no per-job Python): the service's host CPU is stolen
        from the mapping workers on the same cores, so per-job service
        cost must stay in the single-digit microseconds."""
        import time as _time
        _cpu0 = _time.thread_time()
        # one concatenated view of all requests' byte buffers
        bufs = [p[3] for p in pending]
        all_buf = bufs[0] if len(bufs) == 1 else np.concatenate(bufs)
        lens_all = np.concatenate([p[2] for p in pending])  # (M, 2) int32
        n_jobs_per_req = np.array([len(p[2]) for p in pending], np.int64)
        kinds = np.array([0 if len(p) < 5 or p[4] == "fill" else 1
                          for p in pending], np.int64)
        job_req = np.repeat(np.arange(len(pending)), n_jobs_per_req)
        job_kind = kinds[job_req]
        job_ji = np.arange(len(job_req)) - np.repeat(
            np.cumsum(n_jobs_per_req) - n_jobs_per_req, n_jobs_per_req
        )
        t_lens = lens_all[:, 0].astype(np.int64)
        q_lens = lens_all[:, 1].astype(np.int64)
        pair_sz = t_lens + q_lens
        t_offs = np.cumsum(pair_sz) - pair_sz  # start of each job's t
        q_offs = t_offs + t_lens
        # bucket of each FILL job (-1 = overflow/host)
        mx = np.maximum(t_lens, q_lens)
        bucket_arr = np.full(len(mx), -1, np.int64)
        for b in reversed(self.buckets):
            bucket_arr[mx <= b] = b
        bucket_arr[(t_lens == 0) | (q_lens == 0)] = -1
        bucket_arr[job_kind == 1] = -1
        # jobs containing ambiguous code 4 go to the host: the device
        # upload is 2-bit packed (ops/affine_pallas.pack_chars), which
        # cannot represent N-vs-X non-matches.  Nonzero jobs' byte spans
        # tile all_buf contiguously, so one reduceat over their starts
        # computes every job's max code.
        nz = pair_sz > 0
        if len(all_buf) and nz.any():
            seg_max = np.maximum.reduceat(all_buf, t_offs[nz])
            amb = np.zeros(len(mx), bool)
            amb[nz] = seg_max >= 4
            bucket_arr[amb] = -1
        if self.band_ids:
            from ..ops.affine_pallas import BANDED, band_eligible

            elig = band_eligible(t_lens, q_lens) & (bucket_arr > 0)
            bucket_arr[elig] |= BANDED
        handles = []  # (bucket, handle, job_keys [, kind])
        # ---- edit-distance jobs (exact Myers kernel) ------------------
        edit_unrouted = np.zeros(len(mx), bool)
        edit_idx = np.flatnonzero(job_kind == 1)
        if len(edit_idx):
            ea = self.edit_aligner
            eb = np.full(len(edit_idx), -1, np.int64)
            if ea is not None:
                for k, (T, Wd) in enumerate(sorted(ea.buckets,
                                                   reverse=True)):
                    if (T, Wd) not in self.edit_ready:
                        continue
                    ok = (t_lens[edit_idx] <= T) & (q_lens[edit_idx]
                                                    <= Wd * 32)
                    ok &= (t_lens[edit_idx] > 0) & (q_lens[edit_idx] > 0)
                    eb[ok] = k
            edit_unrouted[edit_idx[eb < 0]] = True
            if ea is not None:
                sbuckets = sorted(ea.buckets, reverse=True)
                for k, (T, Wd) in enumerate(sbuckets):
                    idxs = edit_idx[eb == k]
                    B = ea.shape_b[T]
                    for cs in range(0, len(idxs), B):
                        chunk = idxs[cs : cs + B]
                        jobs = [
                            (all_buf[t_offs[j] : t_offs[j] + t_lens[j]],
                             all_buf[q_offs[j] : q_offs[j] + q_lens[j]])
                            for j in chunk
                        ]
                        h = ea.dispatch_jobs(jobs, T, Wd)
                        handles.append(((T, Wd), h, chunk, "edit"))
        overflow = np.flatnonzero((bucket_arr < 0) & (job_kind == 0)
                                  | edit_unrouted)
        for b in self.band_ids + tuple(self.buckets):
            idxs = np.flatnonzero(bucket_arr == b)
            if not len(idxs):
                continue
            Bmax = self.shape_b[b]
            ladder = self._ladder(b)
            w = b & 0xFFFFF  # plane width (mask the BANDED flag)
            for cs in range(0, len(idxs), Bmax):
                chunk = idxs[cs : cs + Bmax]
                # snuggest COMPILED rung: device compute scales with the
                # padded batch (grid tiles), so sub-full chunks dispatch
                # a proportionally smaller shape; rungs still compiling
                # in the background are skipped (pad up instead)
                avail = self.ready_rungs.get(b) or {Bmax}
                B = next((r for r in ladder if r >= len(chunk)
                          and r in avail), Bmax)
                tT = np.full((B, w), 4, np.uint8)
                tQ = np.full((B, w), 4, np.uint8)
                t_len = np.ones(B, np.int32)
                q_len = np.ones(B, np.int32)
                tl = t_lens[chunk]
                ql = q_lens[chunk]
                t_len[: len(chunk)] = tl
                q_len[: len(chunk)] = ql
                # bulk scatter: all chunk jobs' bytes in two fancy writes
                rows = np.repeat(np.arange(len(chunk)), tl)
                within = np.arange(int(tl.sum())) - np.repeat(
                    np.cumsum(tl) - tl, tl
                )
                src = np.repeat(t_offs[chunk], tl) + within
                tT[rows, within] = all_buf[src]
                rows = np.repeat(np.arange(len(chunk)), ql)
                within = np.arange(int(ql.sum())) - np.repeat(
                    np.cumsum(ql) - ql, ql
                )
                src = np.repeat(q_offs[chunk], ql) + within
                tQ[rows, within] = all_buf[src]
                try:
                    h = self.aligner.dispatch_padded(
                        tT, tQ, t_len, q_len, b, n_used=len(chunk)
                    )
                except TypeError:  # aligners without n_used support
                    h = self.aligner.dispatch_padded(tT, tQ, t_len, q_len, b)
                handles.append((b, h, chunk))
        with self._stats_lock:
            if self._stats is not None:
                self._stats["disp_cpu"] += _time.thread_time() - _cpu0
        self.inflight.put(
            (pending, (job_req, job_ji), handles, overflow, resp_put)
        )

    # -- downloader ----------------------------------------------------
    def run_download(self):
        """Downloader loop; run in N_DOWNLOADERS threads so blocking
        device->host fetches overlap (each item is self-contained: one
        dispatch batch with its own requesters, so threads never share
        response state).  The stop sentinel is re-queued so every
        downloader thread sees it; the one that first sees it writes the
        stats file."""
        import time as _time

        stats_path = os.environ.get("VACMAP_TPU_FILL_STATS")
        t_start = _time.monotonic()
        while True:
            item = self.inflight.get()
            if item is None:
                self.inflight.put(None)  # release the other downloaders
                with self._stats_lock:
                    st, self._stats = self._stats, None
                if stats_path and st is not None:
                    import resource

                    ru = resource.getrusage(resource.RUSAGE_SELF)
                    dt = max(_time.monotonic() - t_start, 1e-9)
                    with open(stats_path, "w") as fh:
                        fh.write(
                            "calls=%d reqs=%d jobs=%d jobs/call=%.1f "
                            "fetch_ms/call=%.1f wall_s=%.1f cpu_s=%.1f "
                            "disp_cpu=%.1f dl_cpu=%.1f escal=%d\n"
                            % (st["calls"], st["reqs"], st["jobs"],
                               st["jobs"] / max(st["calls"], 1),
                               st["fetch_s"] * 1e3 / max(st["calls"], 1),
                               dt, ru.ru_utime + ru.ru_stime,
                               st["disp_cpu"], st["dl_cpu"],
                               st.get("escal", 0)))
                break
            pending, (job_req, job_ji), handles, overflow, resp_put = item
            try:
                self._download_item(pending, job_req, job_ji, handles,
                                    overflow, resp_put)
            except Exception:
                import sys
                import traceback

                # a fetch/routing failure must degrade THIS batch to host
                # fills — loudly — never kill the downloader (the bounded
                # inflight queue would fill and wedge the dispatcher, and
                # with it every client)
                print("vacmap fill service: download failed; batch "
                      "degraded to host fills:\n"
                      + traceback.format_exc(limit=6),
                      file=sys.stderr, flush=True)
                for p in pending:
                    client_id, req_id, lens = p[0], p[1], p[2]
                    try:
                        resp_put(client_id, (
                            req_id,
                            {(-1, 0): ("host", list(range(len(lens))))}))
                    except Exception:
                        pass

    def _download_item(self, pending, job_req, job_ji, handles, overflow,
                       resp_put):
        import time as _time

        _dlcpu0 = _time.thread_time()
        # per-request routing tables: req -> {(bucket, chunk#): slot}
        # (chunk# keys stop two same-bucket chunks from merging)
        per_req = [dict() for _ in pending]
        host_extra = {}
        n_escal = 0
        fetch = getattr(self.aligner, "fetch", None)
        n_calls = n_jobs_t = 0
        fetch_s = 0.0

        def req_groups(chunk):
            # chunk rows grouped by requester: [(ri, rows)] — bulk
            # argsort instead of a per-job Python loop
            rks = job_req[chunk]
            order = np.argsort(rks, kind="stable")
            srk = rks[order]
            cuts = np.flatnonzero(srk[1:] != srk[:-1]) + 1
            for g in np.split(order, cuts):
                yield int(srk[0] if not len(g) else rks[g[0]]), g

        for ci, hrec in enumerate(handles):
            b, h, chunk = hrec[0], hrec[1], hrec[2]
            kind = hrec[3] if len(hrec) > 3 else "fill"
            n_calls += 1
            n_jobs_t += len(chunk)
            _t0 = _time.monotonic()
            if kind == "edit":
                dists = self.edit_aligner.fetch(h)
                fetch_s += _time.monotonic() - _t0
                for ri, rows in req_groups(chunk):
                    per_req[ri][(b, ci)] = (
                        "edist", dists[rows], job_ji[chunk[rows]].tolist()
                    )
                continue
            # blocking device->host fetch
            if fetch is not None:
                res = fetch(h)
            else:
                res = ("packed", np.asarray(h))
            fetch_s += _time.monotonic() - _t0
            if res[0] == "rrb":
                # banded planes + escalation flags: flagged jobs go
                # back to the requester's host fill path
                lo, ex, flags = res[1], res[2], res[3]
                for ri, rows in req_groups(chunk):
                    fl = flags[rows]
                    okr = rows[~fl]
                    if len(okr):
                        per_req[ri][(b, ci)] = (
                            "rrB", lo[okr], ex[okr],
                            job_ji[chunk[okr]].tolist(),
                        )
                    bad = rows[fl]
                    if len(bad):
                        host_extra.setdefault(ri, []).extend(
                            job_ji[chunk[bad]].tolist())
                        n_escal += len(bad)
            elif res[0] == "rr":
                lo, ex = res[1], res[2]
                for ri, rows in req_groups(chunk):
                    per_req[ri][(b, ci)] = (
                        "rr", lo[rows], ex[rows],
                        job_ji[chunk[rows]].tolist(),
                    )
            else:
                packed = res[1]
                for ri, rows in req_groups(chunk):
                    per_req[ri][(b, ci)] = (
                        "packed", packed[:, rows],
                        job_ji[chunk[rows]].tolist(),
                    )
        if len(overflow):
            for ri, rows in req_groups(np.asarray(overflow)):
                host_extra.setdefault(ri, []).extend(
                    job_ji[np.asarray(overflow)[rows]].tolist())
        for ri, extra in host_extra.items():
            per_req[ri][(-1, 0)] = ("host", extra)
        for ri, (client_id, req_id, *_rest) in enumerate(pending):
            resp_put(client_id, (req_id, per_req[ri]))
        with self._stats_lock:
            if self._stats is not None:
                self._stats["calls"] += n_calls
                self._stats["jobs"] += n_jobs_t
                self._stats["reqs"] += len(pending)
                self._stats["fetch_s"] += fetch_s
                self._stats["escal"] += n_escal
                self._stats["dl_cpu"] += _time.thread_time() - _dlcpu0


# ---------------------------------------------------------------------------
# client-side decode (shared by both transports)
# ---------------------------------------------------------------------------


def decode_response(msg, pairs, eqx: bool):
    """Tagged per-chunk slots ({key: ("rr", lo, ex, jidxs) | ("packed",
    cols, jidxs) | ("host", jidxs)}) + original pairs -> AlignResult list
    (host-aligning any jobs the device bounced).  The "rr" route feeds
    the device's row-run traceback planes straight to the C++
    decode_rowruns_batch — no packed-stream re-expansion."""
    from .. import native
    from ..ops.affine_pallas import _decode_packed_python, rowruns_to_packed
    from ..ops.affine_ref import AlignResult

    results: List[Optional[AlignResult]] = [None] * len(pairs)
    for slot in msg.values():
        if slot[0] == "host":
            # device-bounced jobs (overflow/ambiguous-base): the host
            # striped batch kernel, not the per-pair python oracle
            from ..pipeline.extend import _host_global_batch

            sub = [pairs[ji] for ji in slot[1]]
            for ji, r in zip(slot[1], _host_global_batch(sub, eqx)):
                results[ji] = r
            continue
        if slot[0] in ("rr", "rrB"):  # rrB = banded (edge-flagged jobs
            # were already routed to the "host" slot by the downloader)
            _, lo, ex, jidxs = slot
            sub = [pairs[ji] for ji in jidxs]
            decoded = native.decode_rowruns(lo, ex, sub, eqx=eqx)
            if decoded is None:  # native lib unavailable
                t_len = np.array([len(t) for t, _ in sub], np.int64)
                q_len = np.array([len(q) for _, q in sub], np.int64)
                packed = rowruns_to_packed(lo, ex, t_len, q_len, lo.shape[1])
                decoded = _decode_packed_python(packed, sub, eqx=eqx)
        else:
            _, packed, jidxs = slot
            sub = [pairs[ji] for ji in jidxs]
            decoded = native.decode_tb_ops(packed, sub, eqx=eqx)
            if decoded is None:
                decoded = _decode_packed_python(packed, sub, eqx=eqx)
        for col, ji in enumerate(jidxs):
            t, q = pairs[ji]
            cig = native.ops_to_cigar(decoded[col])
            results[ji] = AlignResult(cig, False, len(q), len(t), 0, 0, 0)
    return results


def decode_edit_response(msg, n_pairs: int):
    """Edit-kind response -> per-job exact distance or None (host
    fallback: unrouted / oversized / service not ready)."""
    results: List[Optional[int]] = [None] * n_pairs
    for slot in msg.values():
        if slot[0] == "edist":
            for d, ji in zip(slot[1], slot[2]):
                results[ji] = int(d)
    return results


# ---------------------------------------------------------------------------
# in-process transport (single-process executor)
# ---------------------------------------------------------------------------


class AsyncFillAligner:
    """In-process async pipelined fill aligner: same blocking
    ``align_batch(pairs, eqx)`` interface as device_service.
    AggregatingAligner, but dispatch N+1 overlaps download N, so
    concurrently-refining threads only ever wait ~one batch period."""

    # refine_chain ships the divergence window-bound batch here too
    # (round-4 deployment; host aligners keep the native bound pass)
    wants_window_jobs = True

    def __init__(self, aligner=None, buckets=DEFAULT_BUCKETS,
                 max_wait_ms=MAX_WAIT_MS, depth=DEPTH, max_jobs=MAX_JOBS,
                 prewarm: bool = True, force: bool = True):
        if aligner is None:
            from ..ops.affine_pallas import PallasFillAligner

            aligner = PallasFillAligner(buckets=buckets)
        self.core = _ServerCore(aligner, buckets=buckets, depth=depth,
                                max_jobs=max_jobs, max_wait_ms=max_wait_ms,
                                edit_aligner=_make_edit_aligner(),
                                force=force)
        self.req_q: "queue.Queue" = queue.Queue()
        self._events: Dict[int, dict] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._pending_n = 0  # in-flight jobs (backpressure, under _lock)
        # device engages only after the dispatcher thread finishes the
        # prewarm compiles; until then submit() routes to host fills so
        # small/cold runs never stall on Mosaic compilation
        self.ready = threading.Event()
        self.failed = False
        self._do_prewarm = prewarm
        self._threads = [
            threading.Thread(target=self._dispatch_loop, daemon=True),
        ] + [
            threading.Thread(target=self.core.run_download, daemon=True)
            for _ in range(N_DOWNLOADERS)
        ]
        for t in self._threads:
            t.start()

    def _dispatch_loop(self):
        try:
            if self._do_prewarm:
                self.core.prewarm()
            if not self.core.competitive:
                self.failed = True  # calibrated no-go: stay on host fills
        except Exception:
            self.failed = True  # device unusable: stay on host fills
        finally:
            self.ready.set()
        self.core.run_dispatch(
            lambda tmo: self.req_q.get(timeout=tmo), self._resp_put
        )

    def _resp_put(self, client_id, resp):
        req_id, msg = resp
        with self._lock:
            box = self._events.pop(req_id, None)
            if box is not None:
                self._pending_n -= box.get("n", 0)
        if box is not None:
            box["msg"] = msg
            box["event"].set()

    # the refine_chain aligner interface
    def __call__(self, pairs, eqx: bool = False):
        return self.align_batch(pairs, eqx)

    def align_batch(self, pairs, eqx: bool = False):
        return self.wait(self.submit(pairs, eqx))

    def accepting(self) -> bool:
        """Non-reserving saturation peek (see FillClient.accepting)."""
        if self.failed or not self.ready.is_set():
            return False
        return self._pending_n < MAX_INFLIGHT_JOBS

    # -- async interface: refine defers the wait to record assembly ----
    def submit(self, pairs, eqx: bool = False):
        """Enqueue a fill batch; returns an opaque handle for wait().
        The caller keeps processing other reads while the device works.
        Until the prewarm compiles finish (or if the device failed) —
        or while the in-flight backlog is above the backpressure cap —
        the handle routes to host fills instead: never blocks on init,
        never queues behind a saturated device link."""
        if not pairs:
            return (None, pairs, eqx)
        if self.failed or not self.ready.is_set():
            return ("host", pairs, eqx)
        box = {"event": threading.Event(), "msg": None, "n": len(pairs)}
        with self._lock:
            if self._pending_n >= MAX_INFLIGHT_JOBS:
                return ("host", pairs, eqx)
            self._pending_n += len(pairs)
            req_id = self._next_id
            self._next_id += 1
            self._events[req_id] = box
        self.req_q.put((0, req_id, *pack_pairs(pairs)))
        return (box, pairs, eqx)

    def wait(self, handle, timeout: float = 600.0):
        box, pairs, eqx = handle
        if box is None:
            return []
        if box == "host":
            from ..pipeline.extend import _host_global_batch

            return _host_global_batch(pairs, eqx)
        if not box["event"].wait(timeout=timeout):
            raise RuntimeError("device fill service timed out")
        return decode_response(box["msg"], pairs, eqx)

    def edit_batch(self, pairs, timeout: float = 600.0):
        """Exact edit distances on device; None entries = host fallback.
        Short-circuits while the service has no LIVE edit kernel (see
        FillClient.edit_batch)."""
        if (not pairs or self.failed or not self.ready.is_set()
                or not self.core.edit_ready):
            return [None] * len(pairs)
        box = {"event": threading.Event(), "msg": None, "n": len(pairs)}
        with self._lock:
            if self._pending_n >= MAX_INFLIGHT_JOBS:
                return [None] * len(pairs)
            self._pending_n += len(pairs)
            req_id = self._next_id
            self._next_id += 1
            self._events[req_id] = box
        self.req_q.put((0, req_id, *pack_pairs(pairs), "edit"))
        if not box["event"].wait(timeout=timeout):
            raise RuntimeError("device fill service timed out")
        return decode_edit_response(box["msg"], len(pairs))

    def stop(self, timeout: float = 10.0):
        """Drain and join the pipeline threads.  Joining matters at
        process exit: a dispatcher thread still inside a device call
        while the main thread destroys the TPU client dies in C++
        (terminate called ...) instead of Python."""
        self.req_q.put(None)
        for t in self._threads:
            t.join(timeout=timeout)


# ---------------------------------------------------------------------------
# host-emulation aligner (tests / debugging without a TPU)
# ---------------------------------------------------------------------------


class HostEmulFillAligner:
    """``dispatch_padded``-compatible host implementation: emits the same
    packed 2-bit traceback stream as the Pallas kernel (ops back-to-front,
    3-padded, 4 steps/byte), so the whole service pipeline — transports,
    batching, routing, decode — is testable without device hardware."""

    def __init__(self, buckets=DEFAULT_BUCKETS):
        self.buckets = tuple(sorted(buckets))

    def prewarm(self, batch_sizes=(64,), buckets=None):
        pass

    def dispatch_padded(self, tT, tQ, t_len, q_len, bucket: int):
        import re

        from ..ops.affine_ref import align2p

        B = tT.shape[0]
        S = 2 * bucket
        stream = np.full((S, B), 3, np.uint8)
        for col in range(B):
            t = tT[col, : int(t_len[col])]
            q = tQ[col, : int(q_len[col])]
            res = align2p(t, q, match=2, mismatch=-4, gap_open_1=4,
                          gap_extend_1=2, gap_open_2=24, gap_extend_2=1,
                          bw=-1, zdrop=-1, eqx=False)
            codes = []
            for m in re.finditer(r"(\d+)([MID])", res.cigar):
                codes.extend([{"M": 0, "I": 1, "D": 2}[m.group(2)]]
                             * int(m.group(1)))
            codes = codes[::-1]  # traceback emits back-to-front
            stream[: len(codes), col] = codes
        o = stream.reshape(S // 4, 4, B).astype(np.int32)
        return (o[:, 0] | (o[:, 1] << 2) | (o[:, 2] << 4)
                | (o[:, 3] << 6)).astype(np.uint8)


def _make_edit_aligner():
    """Edit-distance device offload: PERMANENTLY STUBBED (round 5).

    Two rounds of on-hardware measurement killed this job kind:
    round 3 measured routing divergence spans to the device Myers
    kernel as a 7.8x e2e LOSS (~30k jobs/run at 0.8-6.3 ms/job vs the
    host cap ladder's <1 core-second total), and round 5 found the
    host stage it would replace has ~ZERO production traffic — since
    the round-4 window-bound pass, every divergence span on realistic
    corpora (bench reads, SV reads, junk-middle reads) is settled by
    the window-fill NM bound, whose fills already route to THIS
    service's fill kind; the exact Myers ladder is a fallback that
    measured 0 calls per 264 reads.  A banded score-only redesign was
    projected from the measured per-(row*step) Mosaic cost (26 ns) at
    0.05-0.5 ms/job — still far above the ~0 host cost it would
    displace (examples/measure_myers_banded_projection.py).  The
    kernel lives on as examples/myers_pallas_device.py; clients'
    edit_batch short-circuits to all-None (host fallback) since no
    live edit kernel is ever reported."""
    return None


def _make_aligner(buckets):
    """The service's device aligner, or None when no accelerator is
    usable.  VACMAP_TPU_FILL_HOST=1 forces the host-emulation aligner
    (tests; CPU jax backends cannot run the Mosaic kernel)."""
    if os.environ.get("VACMAP_TPU_FILL_HOST"):
        return HostEmulFillAligner(buckets=buckets)
    import jax

    if jax.default_backend() in ("cpu",):
        return None
    from ..ops.affine_pallas import PallasFillAligner

    return PallasFillAligner(buckets=buckets)


def async_fill_aligner(buckets=DEFAULT_BUCKETS, force: bool = True,
                       **kw) -> Optional["AsyncFillAligner"]:
    """In-process async fill aligner when a TPU (or the host-emulation
    override) is available; None otherwise.  force=False runs the
    startup calibration and stays on host fills when the device's
    best-case rate cannot beat the host's own fill kernels."""
    if os.environ.get("VACMAP_TPU_NO_FILL_SERVER"):
        return None
    try:
        aligner = _make_aligner(buckets)
    except Exception:
        return None
    if aligner is None:
        return None
    return AsyncFillAligner(aligner=aligner, buckets=buckets, force=force,
                            **kw)


# ---------------------------------------------------------------------------
# cross-process transport (fork-worker CLI deployment)
# ---------------------------------------------------------------------------


def _server_main(req_q, resp_qs, buckets, ready_evt, ok_val, prewarm: bool,
                 force: bool = False, edit_val=None):
    """Entry point of the device-owning service process."""
    try:
        from . import runtime

        runtime.enable_compilation_cache()
        aligner = _make_aligner(buckets)
        if aligner is None:
            ready_evt.set()  # no accelerator: parent falls back to host
            return

        def _edit_ready():
            if edit_val is not None:
                edit_val.value = 1

        core = _ServerCore(aligner, buckets=buckets,
                           edit_aligner=_make_edit_aligner(),
                           force=force, n_clients=len(resp_qs),
                           edit_ready_cb=_edit_ready)
        if prewarm:
            core.prewarm()  # whole dispatch-shape universe, BEFORE ready
        if not core.competitive:
            # calibrated no-go: the device's best-case pipelined fill
            # rate cannot absorb this host's own striped-kernel demand
            # (relay-attached chips) — decline, clients keep host fills
            import logging

            c = core.calib or (0.0, 0.0)
            logging.getLogger("vacmap").info(
                "device fill offload declined by calibration: device "
                "%.0f jobs/s best-case vs host %.0f jobs/s/core x %d "
                "workers (--device-fills on overrides)",
                c[0], c[1], len(resp_qs))
            ready_evt.set()
            return
        ok_val.value = 1
        ready_evt.set()

        def resp_put(client_id, resp):
            resp_qs[client_id].put(resp)

        dls = [threading.Thread(target=core.run_download, daemon=True)
               for _ in range(N_DOWNLOADERS)]
        for dl in dls:
            dl.start()
        core.run_dispatch(lambda tmo: req_q.get(timeout=tmo), resp_put)
        for dl in dls:
            dl.join()
    except Exception:
        ready_evt.set()  # never leave the parent hanging
        raise


class FillServerHandle:
    def __init__(self, proc, req_q, resp_qs, ready_evt, ok_val,
                 pending_ctr=None, lat_sh=None, edit_val=None):
        self.proc = proc
        self.req_q = req_q
        self.resp_qs = resp_qs
        self.ready_evt = ready_evt
        self.ok_val = ok_val
        self.pending_ctr = pending_ctr
        self.lat_sh = lat_sh
        self.edit_val = edit_val

    def client(self, worker_id: int) -> "FillClient":
        return FillClient(worker_id, self.req_q, self.resp_qs[worker_id],
                          ready_evt=self.ready_evt, ok_val=self.ok_val,
                          pending_ctr=self.pending_ctr, lat_sh=self.lat_sh,
                          edit_val=self.edit_val)

    def stop(self):
        try:
            if not self.ready_evt.is_set() or not self.ok_val.value:
                # still initializing (or no accelerator): nothing is in
                # flight — don't wait out the prewarm compiles
                self.proc.terminate()
            else:
                self.req_q.put(None)
                self.proc.join(timeout=30)
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
            self.proc.join(timeout=10)


def start_fill_server(n_clients: int, buckets=DEFAULT_BUCKETS,
                      ctx=None, prewarm: bool = True,
                      wait_ready: bool = True,
                      ready_timeout: float = 900.0,
                      force: bool = False):
    """Fork the device-owning fill server; returns a FillServerHandle or
    None when no usable accelerator is present.

    Must be called BEFORE the mapping workers fork (the queues are
    inherited).  The parent process must not have initialized the TPU
    backend itself: only the service process touches jax."""
    import multiprocessing as mp

    if os.environ.get("VACMAP_TPU_NO_FILL_SERVER"):
        return None
    ctx = ctx or mp.get_context("fork")
    req_q = ctx.Queue()
    resp_qs = [ctx.Queue() for _ in range(n_clients)]
    ready = ctx.Event()
    ok = ctx.Value("i", 0)
    pending = ctx.Value("l", 0)  # jobs in flight, shared by all clients
    edit_val = ctx.Value("i", 0)  # 1 once the service's edit kernel is live
    lat_sh = ctx.Value("d", -1.0)  # shared round-trip EMA (<0 = no data);
    # shared (not per-client) so it survives worker fork generations —
    # a fresh pool otherwise admits its whole deferred window blind
    proc = ctx.Process(
        target=_server_main,
        args=(req_q, resp_qs, buckets, ready, ok, prewarm, force, edit_val),
        daemon=True,
    )
    proc.start()
    if wait_ready:
        if not ready.wait(timeout=ready_timeout) or not ok.value:
            proc.terminate()
            proc.join(timeout=10)
            return None
    return FillServerHandle(proc, req_q, resp_qs, ready, ok,
                            pending_ctr=pending, lat_sh=lat_sh,
                            edit_val=edit_val)


class FillClient:
    """Worker-side handle: thread-safe blocking ``align_batch``; many
    mapping threads can have fills in flight concurrently.

    Response draining happens INSIDE ``wait()`` (one drainer at a time,
    poll-then-recv), NOT in a parked reader thread: mp.Queue.get holds
    the queue's cross-process _rlock while blocked in recv, so a daemon
    router thread parked in get() at process exit leaves that shared
    lock acquired FOREVER — the next fork generation of workers (bench
    min-of-2 pools, CLI re-runs) then deadlocks on acquire.  The drain
    pattern holds _rlock only across a short poll + one message read."""

    wants_window_jobs = True  # see AsyncFillAligner

    def __init__(self, worker_id: int, req_q, resp_q,
                 ready_evt=None, ok_val=None, pending_ctr=None,
                 lat_sh=None, edit_val=None):
        self.worker_id = worker_id
        self.req_q = req_q
        self.resp_q = resp_q
        self._events: Dict[int, dict] = {}
        self._lock = threading.Lock()
        self._drain_lock = threading.Lock()  # one drainer at a time
        self._next_id = 0
        self.failed = False
        self._ready_evt = ready_evt
        self._ok_val = ok_val
        self._ready_cache = ready_evt is None  # no gate -> trust caller
        self._pending = pending_ctr  # shared in-flight job counter
        self._lat_sh = lat_sh  # shared round-trip EMA (survives forks)
        self._edit_val = edit_val  # shared flag: edit kernel live
        self.offloaded_jobs = 0  # accepted by the gate (this client)
        self.bounced_jobs = 0    # host-filled by the gate (this client)
        self.pop_timeouts = 0    # tail-latency host fallbacks
        self._timeout_streak = 0
        # gate-bounced jobs join a CROSS-READ host batch (the host
        # deployment's HostBatchFillAligner) instead of filling per read:
        # per-read residue batches lose the striped kernel's cross-read
        # lane packing and big-job 16-lane amortization (measured
        # +2.3 ms/read)
        self._hb = None
        self._hb_lock = threading.Lock()

    def _gate_open(self) -> bool:
        """Latency-governor half of the admission gate (no reservation):
        False while the round-trip EMA says responses come back slower
        than the deferred window can hide.  Shared across forks/workers;
        decays on rejected peeks so a recovered service gets retried."""
        v = self._lat_sh.value if self._lat_sh is not None else -1.0
        if 0 <= v <= MAX_LAT_S:
            return True
        if v > MAX_LAT_S:
            with self._lat_sh.get_lock():
                self._lat_sh.value *= 0.995
            return False
        # no estimate yet (service fresh): admit conservatively so the
        # first deferred windows cannot pile a seconds-deep backlog
        # before the first round-trip measurement lands
        ctr = self._pending
        return ctr is None or ctr.value < min(512, MAX_INFLIGHT_JOBS)

    def _admit(self, n: int) -> bool:
        """Backpressure gate: reserve n in-flight job slots, or report
        the service saturated (caller host-fills instead of queueing).
        Applies BOTH halves — the latency governor and the in-flight
        cap — so every submit path (window batch, final fills, edit
        spans) is governed uniformly."""
        if not self._gate_open():
            self.bounced_jobs += n
            return False
        ctr = self._pending
        if ctr is None:
            self.offloaded_jobs += n
            return True
        with ctr.get_lock():
            if ctr.value >= MAX_INFLIGHT_JOBS:
                self.bounced_jobs += n
                return False
            ctr.value += n
        self.offloaded_jobs += n
        return True

    def _release(self, box) -> None:
        ctr = self._pending
        if ctr is not None and box is not None:
            n = box.get("n", 0)
            if n:
                box["n"] = 0
                with ctr.get_lock():
                    ctr.value -= n

    def accepting(self) -> bool:
        """Non-reserving saturation peek: False means a submit would be
        bounced by the in-flight cap — or is likely to come back slower
        than the deferred window can hide (latency governor) — so the
        caller should take its host path up-front (refine_chain's
        window-branch gate)."""
        if self.failed or not self._server_ready():
            return False
        if not self._gate_open():
            return False
        ctr = self._pending
        return ctr is None or ctr.value < MAX_INFLIGHT_JOBS

    def _server_ready(self) -> bool:
        """Non-blocking: host fills until the service finishes its prewarm
        compiles; permanent host fallback when it reports no accelerator."""
        if self._ready_cache or self.failed:
            return self._ready_cache and not self.failed
        if not self._ready_evt.is_set():
            return False
        if self._ok_val is not None and not self._ok_val.value:
            self.failed = True
            return False
        self._ready_cache = True
        return True

    def _recv_one(self, poll_s: float) -> bool:
        """Read + route at most one response message.  Replicates
        mp.Queue.get's locked read but holds the cross-process _rlock
        only while data is actually available — never parks on it (see
        class docstring).  Returns True when a message was routed."""
        q = self.resp_q
        if not q._rlock.acquire(timeout=poll_s):
            return False
        try:
            if not q._reader.poll(poll_s):
                return False
            buf = q._reader.recv_bytes()
        finally:
            q._rlock.release()
        import pickle

        req_id, msg = pickle.loads(buf)
        with self._lock:
            box = self._events.pop(req_id, None)
        if box is not None:
            self._release(box)
            t0 = box.get("t0")
            if t0 is not None and self._lat_sh is not None:
                import time as _time

                lat = _time.monotonic() - t0
                with self._lat_sh.get_lock():
                    v = self._lat_sh.value
                    self._lat_sh.value = (lat if v < 0
                                          else 0.7 * v + 0.3 * lat)
            box["msg"] = msg
            box["event"].set()
        return True

    def _drain_until(self, box, timeout: float) -> bool:
        """Drive response draining until ``box`` resolves (True) or the
        deadline passes (False).  Concurrent waiters take turns: one
        drains, the rest park briefly on their own events."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while True:
            if box["event"].is_set():
                return True
            if self._drain_lock.acquire(blocking=False):
                try:
                    if not box["event"].is_set():
                        self._recv_one(0.05)
                finally:
                    self._drain_lock.release()
            else:
                box["event"].wait(0.02)
            if box["event"].is_set():
                return True
            if _time.monotonic() >= deadline:
                return False

    def __call__(self, pairs, eqx: bool = False):
        return self.align_batch(pairs, eqx)

    def align_batch(self, pairs, eqx: bool = False, timeout: float = 600.0):
        return self.wait(self.submit(pairs, eqx), timeout=timeout)

    # -- async interface ----------------------------------------------
    def _host_queue(self, pairs, eqx):
        from ..pipeline.extend import HostBatchFillAligner

        with self._hb_lock:
            if self._hb is None:
                self._hb = HostBatchFillAligner()
            return self._hb.submit(pairs, eqx)

    def _host_wait(self, hq):
        with self._hb_lock:
            return self._hb.wait(hq)

    def submit(self, pairs, eqx: bool = False):
        if (not pairs or self.failed or not self._server_ready()
                or not self._admit(len(pairs))):
            if pairs:
                return ("hostq", self._host_queue(pairs, eqx), pairs, eqx)
            return (None, None, pairs, eqx)
        import time as _time

        box = {"event": threading.Event(), "msg": None, "n": len(pairs),
               "t0": _time.monotonic()}
        with self._lock:
            req_id = self._next_id
            self._next_id += 1
            self._events[req_id] = box
        self.req_q.put((self.worker_id, req_id, *pack_pairs(pairs)))
        return (box, req_id, pairs, eqx)

    def wait(self, handle, timeout: Optional[float] = None):
        """Resolve a submit.  Default timeout is TAIL-BOUNDED: the relay's
        per-call latency has a heavy tail (46 ms median, 1-2 s spikes
        measured), and one spiked response stalls the whole worker at
        window-pop time — so after ~3x the running latency estimate the
        job recomputes on the host and the late response is dropped
        (duplicated work for tail requests only; results identical).
        A streak of timeouts with no successes marks the service dead."""
        box, req_id, pairs, eqx = handle
        if box is None:
            return self._host(pairs, eqx) if pairs else []
        if box == "hostq":
            return self._host_wait(req_id)
        if timeout is None:
            v = self._lat_sh.value if self._lat_sh is not None else -1.0
            timeout = max(0.25, 3.0 * v) if v > 0 else 2.0
        if not self._drain_until(box, timeout):
            with self._lock:
                stale = self._events.pop(req_id, None)
            self._release(stale)
            self.pop_timeouts += 1
            self._timeout_streak += 1
            if self._timeout_streak >= 8:
                self.failed = True  # service dead/wedged: permanent host
            return self._host_wait(self._host_queue(pairs, eqx))
        self._timeout_streak = 0
        return decode_response(box["msg"], pairs, eqx)

    def edit_batch(self, pairs, timeout: float = 600.0):
        """Exact edit distances on device; None entries = host fallback.
        Short-circuits unless the service reports a LIVE edit kernel:
        this call is synchronous (not windowed), so a round trip that can
        only answer all-None stalls its mapping thread for nothing —
        measured as the round-4 device-deployment regression."""
        if (not pairs or self.failed
                or self._edit_val is None or not self._edit_val.value
                or not self._server_ready()
                or not self._admit(len(pairs))):
            return [None] * len(pairs)
        box = {"event": threading.Event(), "msg": None, "n": len(pairs)}
        with self._lock:
            req_id = self._next_id
            self._next_id += 1
            self._events[req_id] = box
        self.req_q.put((self.worker_id, req_id, *pack_pairs(pairs), "edit"))
        if not self._drain_until(box, timeout):
            with self._lock:
                stale = self._events.pop(req_id, None)
            self._release(stale)
            self.failed = True
            return [None] * len(pairs)
        return decode_edit_response(box["msg"], len(pairs))

    @staticmethod
    def _host(pairs, eqx):
        from ..pipeline.extend import _host_global_batch

        return _host_global_batch(pairs, eqx)
