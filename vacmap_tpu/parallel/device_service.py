"""Cross-read aggregation for device alignment calls.

The economics of this platform (measured in DESIGN.md): a device call
costs ~30-60 ms of dispatch/transfer latency regardless of size, while
the Pallas fill kernel itself runs ~54 us/job.  Per-read calls (~85
jobs) would be latency-dominated; AggregatingAligner merges the fill
batches of ALL concurrently-refining reads into one mega-call.

Protocol: refinement threads call ``aligner(pairs, eqx)``; the first
caller becomes the dispatcher — it waits ``max_wait_ms`` for peers to
enqueue, then executes the union as one device batch and distributes the
slices.  Threads block on an event (the GIL is released during the
device call, so host work keeps flowing).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple


class AggregatingAligner:
    def __init__(self, aligner, max_wait_ms: float = 4.0,
                 max_jobs: int = 8192):
        self._aligner = aligner
        self._max_wait = max_wait_ms / 1e3
        self._max_jobs = max_jobs
        self._lock = threading.Lock()
        self._queue: List[dict] = []
        self._dispatching = False

    # the refine_chain aligner interface: (pairs, eqx) -> [AlignResult]
    def __call__(self, pairs, eqx: bool = False):
        return self.align_batch(pairs, eqx)

    def align_batch(self, pairs, eqx: bool = False):
        if not pairs:
            return []
        req = {"pairs": pairs, "eqx": eqx, "event": threading.Event(),
               "result": None, "error": None}
        with self._lock:
            self._queue.append(req)
            if not self._dispatching:
                self._dispatching = True
                dispatcher = True
            else:
                dispatcher = False
        if dispatcher:
            self._dispatch()
        req["event"].wait()
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def _dispatch(self):
        import time

        # let peers pile on (their own enqueue is instant; this sleep
        # trades a few ms of latency for one call instead of many)
        deadline = time.monotonic() + self._max_wait
        while time.monotonic() < deadline:
            with self._lock:
                n = sum(len(r["pairs"]) for r in self._queue)
                if n >= self._max_jobs:
                    break
            time.sleep(0.001)
        with self._lock:
            batch = self._queue
            self._queue = []
            self._dispatching = False
        try:
            by_eqx = {}
            for r in batch:
                by_eqx.setdefault(r["eqx"], []).append(r)
            for eqx, reqs in by_eqx.items():
                all_pairs = []
                for r in reqs:
                    all_pairs.extend(r["pairs"])
                try:
                    results = self._aligner.align_batch(all_pairs, eqx=eqx)
                    off = 0
                    for r in reqs:
                        k = len(r["pairs"])
                        r["result"] = results[off : off + k]
                        off += k
                except Exception as err:  # pragma: no cover - device failure
                    for r in reqs:
                        r["error"] = err
        finally:
            # even on BaseException (KeyboardInterrupt in the dispatcher)
            # every waiter must wake, else refinement threads hang forever
            for r in batch:
                if r.get("result") is None and r.get("error") is None:
                    r["error"] = RuntimeError("device dispatch interrupted")
                r["event"].set()


def device_fill_aligner(max_wait_ms: float = 4.0) -> Optional[AggregatingAligner]:
    """A cross-read batching device fill aligner when a TPU is present
    (None otherwise — callers fall back to the host kernels)."""
    try:
        import jax

        if jax.default_backend() in ("cpu",):
            return None
        from ..ops.affine_pallas import PallasFillAligner

        return AggregatingAligner(PallasFillAligner(), max_wait_ms=max_wait_ms)
    except Exception:
        return None
