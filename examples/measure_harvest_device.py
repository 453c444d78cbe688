"""On-hardware verdict for a device k=9 harvest (round-5 item 4).

The local re-chain's harvest (ops/harvest.py; reference
get_localmap_multi_all_forDP_inv_guide_1, mammap_clrnano.py:23069) is
the largest host stage with no device story.  This experiment measures
the device SPEED-OF-LIGHT for its core — per-batch exact-match table
build (scatter) + per-bp read scan (gather) + diagonal filter — as an
XLA kernel on captured-realistic shapes, against the production native
host harvest on the same workload.

Deliberate simplifications that UNDERSTATE device cost (single-hit
table only — the real semantics need multi-hit chains; hit COUNT
download only — the real pipeline needs the hit lists; no per-diagonal
grow/emit merge, which is sequential and would stay on host): if even
this lower bound loses on wall clock, the negative verdict is solid.

Run on the TPU host:  python examples/measure_harvest_device.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 9
TBL = 4 ** K  # 262144
W = 131072    # padded total window bases per call (measured 50-130 kb)
R = 16384     # padded read scan span (12-20 kb reads)
B = 16        # harvest calls per device batch


def main():
    import jax
    import jax.numpy as jnp

    from vacmap_tpu.index import ReferenceIndex
    from vacmap_tpu.ops.harvest import harvest_anchors
    from vacmap_tpu.parallel import runtime
    from vacmap_tpu.seq import encode, revcomp_codes

    runtime.enable_compilation_cache()

    # ---- realistic workload: capture real harvest calls ---------------
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", np.uint8)
    glen = 20_000_000
    g = rng.integers(0, 4, glen, dtype=np.uint8)
    genome = {"chrH": bases[g].tobytes().decode()}
    idx = ReferenceIndex.build(genome, k=15, w=10)

    calls = []
    import vacmap_tpu.pipeline.local as L
    orig = L.harvest_anchors

    def capture(*a, **kw):
        calls.append((a, kw))
        return orig(*a, **kw)

    L.harvest_anchors = capture
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.pipeline.mapper import Mapper

    m = Mapper(idx, AlignerConfig(mode="H"))
    for i in range(B):
        st = int(rng.integers(0, glen - 21_000))
        frag = g[st : st + 20_000].copy()
        a, b = 7000, 13000
        frag[a:b] = (3 - frag[a:b])[::-1]  # inversion -> real guide splits
        mut = frag.copy()
        mm = rng.random(len(mut)) < 0.05
        mut[mm] = rng.integers(0, 4, int(mm.sum()), dtype=np.uint8)
        m.map_read(f"h{i}", bases[mut].tobytes().decode())
    L.harvest_anchors = orig
    calls = calls[:B]
    print(f"captured {len(calls)} real harvest calls")

    # host timing on the captured calls (the production native path)
    for a, kw in calls:
        harvest_anchors(*a, **kw)
    t0 = time.time()
    reps = 5
    n_anch = 0
    for _ in range(reps):
        n_anch = sum(len(harvest_anchors(*a, **kw)) for a, kw in calls)
    host_ms = (time.time() - t0) / reps / len(calls) * 1e3
    print(f"host harvest: {host_ms:.2f} ms/call ({n_anch} anchors/batch)")

    # ---- device lower-bound kernel -------------------------------------
    @partial(jax.jit, static_argnames=())
    def dev_harvest(win, wpos, wvalid, read, rvalid, diag0):
        def kcodes(c):
            x = c.astype(jnp.int32)
            code = jnp.zeros_like(x)
            for j in range(K):
                code = code + (
                    jnp.roll(x, -j, axis=1) << (2 * (K - 1 - j)))
            return code

        wk = kcodes(win)
        rows = jnp.arange(win.shape[0])[:, None]
        big = jnp.int32(2 ** 30)
        tbl = jnp.full((win.shape[0], TBL), big)
        tbl = tbl.at[rows, wk].min(jnp.where(wvalid, wpos, big))
        rk = kcodes(read)
        hit = tbl[rows, rk]
        rp = jnp.arange(read.shape[1])[None, :]
        diag = hit - rp
        ok = (hit < big) & rvalid & (jnp.abs(diag - diag0) <= 2000)
        return ok.sum(axis=1)

    win = np.zeros((B, W), np.uint8)
    wpos = np.zeros((B, W), np.int32)
    wval = np.zeros((B, W), bool)
    red = np.zeros((B, R), np.uint8)
    rval = np.zeros((B, R), bool)
    diag0 = np.zeros((B, 1), np.int32)
    for i, (a, kw) in enumerate(calls):
        guide, read_codes = a[0], a[1]
        ref_codes = a[3]
        spans = []
        by_ref = np.sort(guide[:, 1])
        st = en = int(by_ref[0])
        for v in by_ref[1:]:
            if v - en < 7000:
                en = int(v)
            else:
                spans.append((st, en))
                st = en = int(v)
        spans.append((st, en))
        off = 0
        for s, e in spans:
            s, e = max(s - 7000, 0), min(e + 7000, len(ref_codes))
            ln = min(e - s, W - off)
            win[i, off : off + ln] = ref_codes[s : s + ln]
            wpos[i, off : off + ln] = np.arange(s, s + ln)
            wval[i, off : off + ln] = True
            off += ln
            if off >= W:
                break
        rl = min(len(read_codes), R)
        red[i, :rl] = read_codes[:rl]
        rval[i, :rl] = True
        diag0[i] = int(np.median(guide[:, 1] - guide[:, 0]))

    args = [jnp.asarray(x) for x in (win, wpos, wval, red, rval, diag0)]
    out = dev_harvest(*args)
    out.block_until_ready()
    print("device hit counts per call:", np.asarray(out)[:6], "...")
    # compute-only (inputs resident)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        dev_harvest(*args).block_until_ready()
        best = min(best, time.time() - t0)
    dev_compute_ms = best / B * 1e3
    # with per-call transfers (window+read upload, count download)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        a2 = [jnp.asarray(x) for x in (win, wpos, wval, red, rval, diag0)]
        np.asarray(dev_harvest(*a2))
        best = min(best, time.time() - t0)
    dev_total_ms = best / B * 1e3
    up_mb = sum(x.nbytes for x in (win, wpos, wval, red, rval)) / 1e6
    print(f"device lower bound: compute {dev_compute_ms * 1e3:.1f} us/call, "
          f"with transfers {dev_total_ms * 1e3:.1f} us/call "
          f"(upload {up_mb:.1f} MB/batch of {B})")
    print(f"verdict: device/host = {dev_compute_ms / host_ms:.2f}x "
          f"(compute only), {dev_total_ms / host_ms:.2f}x (e2e)")


if __name__ == "__main__":
    main()
