# MOVED from vacmap_tpu/ops/myers_pallas.py (round 5): the edit-distance
# device offload is a documented negative result — 7.8x e2e loss measured
# round 3, and round 5 found the host ladder it would replace has ~zero
# production traffic since the window-bound divergence pass.  Kept here as
# a working reference kernel (multi-word bit-parallel Myers on the VPU with
# a Kogge-Stone carry chain); see examples/measure_myers_banded_projection.py
# for the banded-redesign decision numbers.
"""Pallas TPU kernel: bit-parallel Myers global edit distance.

Device counterpart of the host's blocked Myers kernel
(native/vacmap_native.cpp::myers_edit_distance, itself the replacement
for the reference's edlib distance call, mammap_clrnano.py:19251).

Myers 1999 packs the DP column into bitvectors (Pv/Mv) and advances one
TEXT char per step with ~15 word operations; here the pattern's
ceil(m/32) words ride the VPU lanes (word w at lane w, little-endian)
and the batch rides the sublanes, so one step costs ~50 vector ops on
(tb, Wd) int32 tiles regardless of pattern length:

  * the multi-word addition's carry chain is a Kogge-Stone scan over
    lanes: per-word generate/propagate, log2(Wd) compose steps;
  * the <<1 shifts borrow the adjacent word's MSB via a lane roll;
  * the running score D(i, m) is tracked as per-column ±1 contributions
    accumulated at the pattern-end bit (host-uploaded one-hot mask) and
    reduced once at the end — no per-column scalar extraction.

Exact for ALL distances (no band, no cap): the client decision
d > cap needs no escalation path.  Peq tables are packed host-side
(vectorized numpy) and uploaded — 16 B per word per job.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256
MONE = -1  # int32 all-ones


def _myers_kernel(tT_ref, peq_ref, mhi_ref, nn_ref, out_ref, *, Wd, T, tb):
    """One tile: tb jobs, text columns 1..T, Wd pattern words on lanes.

    peq_ref: (4, tb, Wd) int32 — pattern match bits per char
    mhi_ref: (tb, Wd) int32 — one-hot bit at pattern position m-1
    nn_ref:  (tb, Wd) int32 — lane 0 = n (text length)
    out_ref: (tb, Wd) int32 — per-word accP - accM (host sums + m)
    """
    nn = nn_ref[:, :]  # (tb, Wd) int32, lane 0 = n; values >= 0 so the
    # always-false compare below ties iota to an input layout (the
    # Mosaic build cannot carry replicated iota layouts through loops)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, Wd), 1)
    iota_u = jnp.where(nn < -9, 0, iota)
    n_job = jnp.sum(jnp.where(iota_u == 0, nn, 0), axis=1, keepdims=True)

    peq0 = peq_ref[pl.ds(0, 1)][0]  # (tb, Wd) int32
    peq1 = peq_ref[pl.ds(1, 1)][0]
    peq2 = peq_ref[pl.ds(2, 1)][0]
    peq3 = peq_ref[pl.ds(3, 1)][0]
    mhi = mhi_ref[:, :]
    zero = jnp.where(nn < -9, 1, 0)  # all-zero, input-tied
    n_full = zero + n_job

    iota256 = jax.lax.broadcasted_iota(jnp.int32, (tb, CHUNK), 1)

    def pick256(tab, idx):
        m = jnp.where(tab < -(1 << 30) - 1, 0, iota256) == idx
        return jnp.sum(jnp.where(m, tab, 0), axis=1, keepdims=True)

    def carry_scan(g, p):
        # c[w] = carry INTO word w: c[0]=0; c[w] = g[w-1] | (p[w-1] &
        # c[w-1]).  Shift (g, p) up one lane then Kogge-Stone compose.
        g = jnp.where(iota_u == 0, 0, pltpu.roll(g, shift=1, axis=1))
        p = jnp.where(iota_u == 0, 0, pltpu.roll(p, shift=1, axis=1))
        s = 1
        while s < Wd:
            gs = jnp.where(iota_u < s, 0, pltpu.roll(g, shift=s, axis=1))
            ps = jnp.where(iota_u < s, 0, pltpu.roll(p, shift=s, axis=1))
            g = g | (p & gs)
            p = p & ps
            s *= 2
        return g  # 0/1 per word

    def shl1(x, fill_lsb):
        # multi-word (x << 1) with cross-word carry; fill_lsb (0/1) goes
        # into bit 0 of word 0
        msb = jnp.logical_and(x < 0, True).astype(jnp.int32)  # bit 31
        below = jnp.where(iota_u == 0, fill_lsb,
                          pltpu.roll(msb, shift=1, axis=1))
        return jnp.bitwise_or(jnp.left_shift(x, 1), below)

    def col(it, carry):
        Pv, Mv, accP, accM = carry
        i = it + 1
        tchunk = tT_ref[pl.ds((i - 1) // CHUNK, 1)][0]
        a_i = pick256(tchunk, (i - 1) % CHUNK)  # (tb, 1)
        Eq = jnp.where(
            a_i == 0, peq0,
            jnp.where(a_i == 1, peq1,
                      jnp.where(a_i == 2, peq2,
                                jnp.where(a_i == 3, peq3, zero))),
        )
        Xv = Eq | Mv
        X = Eq & Pv
        s = X + Pv  # per-word wrap-around add
        # unsigned overflow of X + Pv: with int32, carry-out happened iff
        # (s ^ X) & (s ^ Pv) has the sign bit... standard trick:
        # c_out = ((X & Pv) | ((X | Pv) & ~s)) >> 31 (bit 31 of the
        # carry-out expression)
        g = jnp.right_shift(
            jnp.bitwise_or(X & Pv, jnp.bitwise_and(X | Pv, ~s)), 31
        ) & 1
        p_prop = (s == MONE).astype(jnp.int32)
        c = carry_scan(g, p_prop)
        sum_ = s + c  # carry-in 0/1; chains handled by the scan
        Xh = (sum_ ^ Pv) | Eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        active = n_full >= i
        hitP = ((Ph & mhi) != 0) & active
        hitM = ((Mh & mhi) != 0) & active
        accP = accP + hitP.astype(jnp.int32)
        accM = accM + hitM.astype(jnp.int32)
        Phs = shl1(Ph, zero[:, :1] + 1)
        Mhs = shl1(Mh, zero[:, :1])
        Pv = Mhs | ~(Xv | Phs)
        Mv = Phs & Xv
        return Pv, Mv, accP, accM

    UNROLL = 4
    assert T % UNROLL == 0

    def block(blk, carry):
        for u in range(UNROLL):
            carry = col(blk * UNROLL + u, carry)
        return carry

    init = (zero + MONE, zero, zero, zero)
    _, _, accP, accM = jax.lax.fori_loop(0, T // UNROLL, block, init)
    out_ref[:, :] = accP - accM


@functools.partial(jax.jit, static_argnames=("Wd", "T", "tb", "interpret"))
def _myers_device(tT, peq, mhi, nn, Wd: int, T: int, tb: int = 8,
                  interpret: bool = False):
    B = mhi.shape[0]
    return pl.pallas_call(
        functools.partial(_myers_kernel, Wd=Wd, T=T, tb=tb),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tT.shape[0], tb, CHUNK), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tb, Wd), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Wd), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Wd), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, Wd), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wd), jnp.int32),
        interpret=interpret,
    )(tT.astype(jnp.int32), peq.astype(jnp.int32), mhi.astype(jnp.int32),
      nn.astype(jnp.int32))


def pack_peq(queries: Sequence[np.ndarray], Wd: int):
    """Vectorized host-side Peq packing: (4, B, Wd) int32 + one-hot
    end-bit masks (B, Wd) int32."""
    B = len(queries)
    peq = np.zeros((4, B, Wd * 32), np.uint8)
    mhi = np.zeros((B, Wd), np.uint32)
    for j, q in enumerate(queries):
        m = len(q)
        for c in range(4):
            peq[c, j, :m] = q == c
        mhi[j, (m - 1) // 32] = np.uint32(1) << np.uint32((m - 1) % 32)
    # bits -> int32 words, little-endian within the word
    weights = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint64)
    pw = (peq.reshape(4, B, Wd, 32).astype(np.uint64) * weights).sum(
        axis=3
    ).astype(np.uint32)
    return pw.view(np.int32), mhi.view(np.int32)


# buckets: (text columns T, pattern words Wd); device cost ~ T * Wd;
# Wd is a multiple of 128 lanes, sized for m <= 1.4 * T (the divergence
# filter only sees pairs with |n - m| <= 0.4 * min(n, m)).  Tiles are
# TALL (many jobs per program): the measured Mosaic per-vector-op fixed
# cost (~180 ns) dwarfs the data cost on narrow (8, 128) tiles, so each
# op must serve as many jobs as VMEM allows.
DEFAULT_BUCKETS = ((2048, 128), (8192, 384), (20480, 896))
DEFAULT_B = {2048: 64, 8192: 32, 20480: 32}
DEFAULT_TB = {2048: 64, 8192: 32, 20480: 32}


class PallasMyersAligner:
    """Batched EXACT global edit distances on device (no cap, no band)."""

    def __init__(self, buckets=DEFAULT_BUCKETS, shape_b=None, tb=None,
                 interpret: bool = False):
        self.buckets = tuple(sorted(buckets))
        self.shape_b = dict(shape_b or DEFAULT_B)
        self.tb = dict(tb) if isinstance(tb, dict) else (
            {T: (tb or DEFAULT_TB.get(T, 8)) for T, _ in self.buckets}
        )
        self.interpret = interpret

    def _bucket(self, n: int, m: int):
        for T, Wd in self.buckets:
            if n <= T and m <= Wd * 32:
                return (T, Wd)
        return None

    def prewarm(self, buckets=None):
        for T, Wd in (buckets if buckets is not None else self.buckets):
            B = self.shape_b[T]
            t = np.zeros(8, np.uint8)
            q = np.zeros(8, np.uint8)
            self.distance_batch([(t, q)] * min(B, 4), force_bucket=(T, Wd))

    def dispatch_jobs(self, jobs: Sequence[Tuple[np.ndarray, np.ndarray]],
                      T: int, Wd: int):
        """Async dispatch of one bucket batch; returns a handle for
        ``fetch`` (the device works while the caller pipelines)."""
        B = self.shape_b[T]
        assert len(jobs) <= B
        tc = T // CHUNK
        tT = np.full((tc, B, CHUNK), 4, np.uint8)
        nn = np.zeros((B, Wd), np.int32)
        nn[:, 0] = 1
        for col_, (t, q) in enumerate(jobs):
            nn[col_, 0] = len(t)
            for c in range(0, len(t), CHUNK):
                tT[c // CHUNK, col_, : min(CHUNK, len(t) - c)] = \
                    t[c : c + CHUNK]
        qs = [q for _, q in jobs]
        qs += [np.zeros(1, np.uint8)] * (B - len(jobs))
        peq, mhi = pack_peq(qs, Wd)
        out = _myers_device(
            jnp.asarray(tT), jnp.asarray(peq), jnp.asarray(mhi),
            jnp.asarray(nn), Wd=Wd, T=T, tb=self.tb.get(T, 8),
            interpret=self.interpret,
        )
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return (out, [len(q) for _, q in jobs])

    def fetch(self, handle) -> np.ndarray:
        """Blocking: handle -> int64 distances for the dispatched jobs."""
        out, m_list = handle
        deltas = np.asarray(out).sum(axis=1)
        return np.asarray(m_list, np.int64) + deltas[: len(m_list)]

    def distance_batch(self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
                       force_bucket=None) -> List[int]:
        """Exact editDistance(t, q) per pair; -1 for pairs that exceed
        every bucket (caller falls back to host)."""
        results = [-1] * len(pairs)
        groups = {}
        for i, (t, q) in enumerate(pairs):
            if len(t) == 0 or len(q) == 0:
                results[i] = max(len(t), len(q))
                continue
            bk = force_bucket or self._bucket(len(t), len(q))
            if bk is None:
                continue
            groups.setdefault(bk, []).append(i)
        for (T, Wd), idxs in groups.items():
            B = self.shape_b[T]
            for cs in range(0, len(idxs), B):
                chunk = idxs[cs : cs + B]
                dists = self.fetch(
                    self.dispatch_jobs([pairs[i] for i in chunk], T, Wd)
                )
                for col_, i in enumerate(chunk):
                    results[i] = int(dists[col_])
        return results
