"""Pallas TPU fill kernel: mega-batched global two-piece affine alignment.

Device counterpart of the host striped aligner (native align2p_batch) and
the reference's `mp.k_cigar(..., bw=-1)` global fills
(mammap_clrnano.py:21554).  Design, tuned to the measured axon/TPU cost
model (see DESIGN.md):

  * the DP runs as ONE Pallas kernel, grid over 8-job tiles; jobs ride
    the sublanes, query positions ride the lanes; per-row state (H, E1,
    E2) lives in registers/VMEM — no XLA per-op dispatch inside the loop
  * the FULL matrix is computed (lanes = bucket size), so results are
    exactly the bw=-1 reference semantics — no band, no escalation
  * traceback bits go to HBM (T, B, N) but NEVER to the host: a second
    XLA scan walks all B paths in lockstep (one (B,) gather per step —
    the only gather shape this backend runs fast), emitting one 2-bit op
    per step; ops are packed 4-per-byte on device so the only download
    is (T+Q)/4 bytes per job
  * the packed op streams are decoded to CIGARs by the C++ side
    (decode_tb_ops), including =/X expansion, at ~ns/op

Mosaic constraints honoured (this toolchain crashes on violations):
vector-only kernel bodies (no scalar loads from VMEM), static lane
slices, dynamic indexing only on the leading block dimension.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .affine_ref import AlignResult, align2p

TB = 8  # jobs per program (sublane tile)
NEG = -1e9  # python literal: jnp scalars would be captured consts in the kernel


def _fill_kernel(tT_ref, tQ_ref, bits_ref, *, N, match, mismatch, o1, e1,
                 o2, e2):
    """One program fills the full N x N DP for TB jobs and writes
    per-row traceback bits.  Bit layout identical to the host kernel:
    op in bits 0-2 (0=DIAG 1=E1 2=E2 3=F1 4=F2), ext flags 8/16/32/64."""
    # plain python floats: 0-D jnp constants need replicated layouts this
    # Mosaic build cannot produce
    f_mat = float(match)
    f_mis = float(mismatch)
    f_e1 = float(e1)
    f_e2 = float(e2)
    f_o1e1 = float(o1 + e1)
    f_o2e2 = float(o2 + e2)
    f_o1 = float(o1)
    f_o2 = float(o2)

    tQ = tQ_ref[:, :]  # (TB, N) int32 query chars (lane l = position j-1)
    tT = tT_ref[:, :]  # (TB, N) int32 target chars
    iota = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)
    iota_f = iota.astype(jnp.float32)

    def unrepl(v):
        # iota-derived values carry a sublane-replicated layout that this
        # Mosaic build cannot relayout at loop back-edges; tying them to
        # an input forces the standard layout (value unchanged: tT >= 0)
        return jnp.where(tT < 0, 0.0, v)

    jpos = unrepl(iota_f + 1.0)  # j of lane l
    # gap tables as vectors (traced scalars can't broadcast here):
    # lane l holds gapf(l) / gapf(l+1), with gapf(0) = 0 (H(0,0) = 0)
    gap_l = unrepl(jnp.where(
        iota == 0, 0.0,
        jnp.minimum(f_o1 + f_e1 * iota_f, f_o2 + f_e2 * iota_f),
    ))
    gap_l1 = unrepl(jnp.minimum(f_o1 + f_e1 * (iota_f + 1.0),
                                f_o2 + f_e2 * (iota_f + 1.0)))

    def shift1(x, fill):
        r = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(iota == 0, fill, r)

    def prefmax(x):
        # inclusive prefix max along lanes via log-step rolls
        s = 1
        while s < N:
            shifted = jnp.where(iota < s, NEG, pltpu.roll(x, shift=s, axis=1))
            x = jnp.maximum(x, shifted)
            s *= 2
        return x

    def pick(tab, i):
        # extract lane i of (TB, N) as a (TB, 1) broadcastable column
        return jnp.sum(jnp.where(iota == i, tab, 0.0), axis=1)[:, None]

    def row(i, carry):
        H, E1, E2 = carry  # (TB, N) for j = 1..N at row i-1
        h0_prev = -pick(gap_l, i - 1)  # (TB,1) H(i-1, 0)
        h0_cur = -pick(gap_l1, i - 1)  # (TB,1) H(i, 0) = -gapf(i)
        tchar = jnp.sum(jnp.where(iota == i - 1, tT, 0), axis=1)[:, None]
        sub = jnp.where((tQ == tchar) & (tchar < 4), f_mat, f_mis)
        diag_in = jnp.where(iota == 0, h0_prev, pltpu.roll(H, shift=1, axis=1))
        diag = diag_in + sub
        E1n = jnp.maximum(E1 - f_e1, H - f_o1e1)
        E2n = jnp.maximum(E2 - f_e2, H - f_o2e2)
        H0 = jnp.maximum(diag, jnp.maximum(E1n, E2n))
        # F gaps: F(j) = max(max_{1<=j'<j} G(j'), H(i,0)) - j*e - o with
        # G(j') = H0(j') + j'*e (prefix-max formulation of affine_ref.py)
        G1 = H0 + jpos * f_e1
        P1 = jnp.maximum(shift1(prefmax(G1), NEG), h0_cur)
        F1 = P1 - jpos * f_e1 - f_o1
        G2 = H0 + jpos * f_e2
        P2 = jnp.maximum(shift1(prefmax(G2), NEG), h0_cur)
        F2 = P2 - jpos * f_e2 - f_o2
        Hn = jnp.maximum(H0, jnp.maximum(F1, F2))

        op = jnp.full((TB, N), 4, jnp.int32)
        op = jnp.where(Hn == F1, 3, op)
        op = jnp.where(Hn == E2n, 2, op)
        op = jnp.where(Hn == E1n, 1, op)
        op = jnp.where(Hn == diag, 0, op)
        bits = op
        bits = bits | jnp.where(E1n == E1 - f_e1, 8, 0)
        bits = bits | jnp.where(E2n == E2 - f_e2, 16, 0)
        bits = bits | jnp.where(F1 == shift1(F1, NEG) - f_e1, 32, 0)
        bits = bits | jnp.where(F2 == shift1(F2, NEG) - f_e2, 64, 0)
        bits_ref[pl.ds(i - 1, 1)] = bits.astype(jnp.uint8)[None]
        return (Hn, E1n, E2n)

    init = (-gap_l1, jnp.full((TB, N), NEG), jnp.full((TB, N), NEG))
    jax.lax.fori_loop(1, N + 1, row, init)


@functools.partial(
    jax.jit,
    static_argnames=("N", "match", "mismatch", "o1", "e1", "o2", "e2",
                     "interpret"),
)
def _fill_and_traceback(
    tT: jnp.ndarray,  # (B, N) int32
    tQ: jnp.ndarray,  # (B, N) int32
    t_len: jnp.ndarray,  # (B,) int32
    q_len: jnp.ndarray,  # (B,) int32
    N: int,
    match: int = 2,
    mismatch: int = -4,
    o1: int = 4,
    e1: int = 2,
    o2: int = 24,
    e2: int = 1,
    interpret: bool = False,
):
    B = tT.shape[0]
    bits = pl.pallas_call(
        functools.partial(
            _fill_kernel, N=N, match=match, mismatch=mismatch,
            o1=o1, e1=e1, o2=o2, e2=e2,
        ),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (N, TB, N), lambda b: (0, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, B, N), jnp.uint8),
        interpret=interpret,
    )(tT.astype(jnp.int32), tQ.astype(jnp.int32))

    # ---- lockstep traceback scan (XLA): one 2-bit op per step ---------
    bits_flat = bits.reshape(-1).astype(jnp.int32)
    S = 2 * N
    lanes = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        i, j, state = carry
        done = (i <= 0) & (j <= 0)
        ic = jnp.maximum(i, 1)
        jc = jnp.maximum(j, 1)
        idx = ((ic - 1) * B + lanes) * N + (jc - 1)
        b = jnp.take(bits_flat, idx)
        op = b & 7
        eff = jnp.where(state > 0, state, op)
        # matrix-edge forcing: i==0 drains query (I), j==0 drains target (D)
        eff = jnp.where((i <= 0) & ~done, 3, eff)
        eff = jnp.where((j <= 0) & ~done, 1, eff)
        is_diag = eff == 0
        is_del = (eff == 1) | (eff == 2)
        is_ins = (eff == 3) | (eff == 4)
        emit = jnp.where(
            done, 3, jnp.where(is_diag, 0, jnp.where(is_ins, 1, 2))
        ).astype(jnp.uint8)
        di = jnp.where(done, 0, jnp.where(is_diag | is_del, 1, 0))
        dj = jnp.where(done, 0, jnp.where(is_diag | is_ins, 1, 0))
        ext_bit = jnp.left_shift(8, jnp.maximum(eff - 1, 0))
        run_cont = (b & ext_bit) > 0
        # runs only continue while inside the matrix (forced edge moves
        # are plain drains)
        inside = (i > 0) & (j > 0)
        nstate = jnp.where(
            ~done & inside & (is_del | is_ins) & run_cont, eff, 0
        )
        return (i - di, j - dj, nstate), emit

    init = (t_len.astype(jnp.int32), q_len.astype(jnp.int32),
            jnp.zeros(B, jnp.int32))
    _, ops = jax.lax.scan(step, init, None, length=S)  # (S, B) uint8
    o = ops.reshape(S // 4, 4, B).astype(jnp.int32)
    packed = (o[:, 0] | (o[:, 1] << 2) | (o[:, 2] << 4) | (o[:, 3] << 6))
    return packed.astype(jnp.uint8)  # (S//4, B)


class PallasFillAligner:
    """Host-facing mega-batched device fill aligner.

    API-compatible with affine_jax.BatchAligner in glob mode:
    ``align_batch(pairs, eqx)`` -> list of AlignResult (cigar only, like
    the host batched path).  Jobs above the largest bucket or with an
    empty side fall back to the host aligner.
    """

    def __init__(self, buckets: Sequence[int] = (256, 512),
                 match=2, mismatch=-4, o1=4, e1=2, o2=24, e2=1,
                 max_batch: int = 4096, interpret: bool = False):
        self.buckets = sorted(buckets)
        self.kw = dict(match=match, mismatch=mismatch, o1=o1, e1=e1,
                       o2=o2, e2=e2)
        self.max_batch = max_batch
        self.interpret = interpret

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return -1

    # ------------------------------------------------------------------
    def dispatch_padded(self, tT: np.ndarray, tQ: np.ndarray,
                        t_len: np.ndarray, q_len: np.ndarray, bucket: int):
        """Async dispatch of one pre-padded (B, bucket) batch: returns the
        device array handle for the packed traceback stream WITHOUT
        fetching it.  jax dispatch is asynchronous, so the caller (the
        fill service's dispatcher thread) can pipeline call N+1 while the
        downloader thread blocks on ``np.asarray(handle_N)``."""
        return _fill_and_traceback(
            jnp.asarray(tT, jnp.int32), jnp.asarray(tQ, jnp.int32),
            jnp.asarray(t_len), jnp.asarray(q_len),
            N=bucket, interpret=self.interpret, **self.kw,
        )

    def prewarm(self, batch_sizes: Sequence[int] = (64,),
                buckets: Optional[Sequence[int]] = None):
        """Compile the (B, bucket) shape universe ahead of traffic (Mosaic
        fresh compiles are minutes; the persistent cache makes this a
        one-time cost per machine)."""
        for bucket in (buckets if buckets is not None else self.buckets):
            for B in batch_sizes:
                tT = np.full((B, bucket), 4, np.uint8)
                tQ = np.full((B, bucket), 4, np.uint8)
                tT[:, 0] = 1
                tQ[:, 0] = 1
                lens = np.ones(B, np.int32)
                np.asarray(self.dispatch_padded(tT, tQ, lens, lens, bucket))

    # ------------------------------------------------------------------
    def align_batch(self, pairs: List[Tuple[np.ndarray, np.ndarray]],
                    eqx: bool = False) -> List[Optional[AlignResult]]:
        from .. import native

        results: List[Optional[AlignResult]] = [None] * len(pairs)
        groups = {}
        for i, (t, q) in enumerate(pairs):
            b = self._bucket(max(len(t), len(q)))
            if b < 0 or len(t) == 0 or len(q) == 0:
                results[i] = align2p(
                    t, q,
                    match=self.kw["match"], mismatch=self.kw["mismatch"],
                    gap_open_1=self.kw["o1"], gap_extend_1=self.kw["e1"],
                    gap_open_2=self.kw["o2"], gap_extend_2=self.kw["e2"],
                    bw=-1, zdrop=-1, eqx=eqx,
                )
                continue
            groups.setdefault(b, []).append(i)
        for bucket, idxs in groups.items():
            for cs in range(0, len(idxs), self.max_batch):
                self._run_group(
                    pairs, idxs[cs : cs + self.max_batch], bucket, eqx,
                    results, native,
                )
        return results

    def _run_group(self, pairs, idxs, bucket, eqx, results, native):
        n = len(idxs)
        # batch dim padded to power-of-two buckets: _fill_and_traceback
        # compiles per (B, N) shape and Mosaic compiles are minutes-fresh
        # on this platform — bound the shape universe
        B = 64
        while B < n:
            B *= 2
        tT = np.full((B, bucket), 4, np.uint8)
        tQ = np.full((B, bucket), 4, np.uint8)
        t_len = np.ones(B, np.int32)
        q_len = np.ones(B, np.int32)
        for b, i in enumerate(idxs):
            t, q = pairs[i]
            tT[b, : len(t)] = t
            tQ[b, : len(q)] = q
            t_len[b] = len(t)
            q_len[b] = len(q)
        packed = np.asarray(
            self.dispatch_padded(tT, tQ, t_len, q_len, bucket)
        )  # (S//4, B) uint8
        decoded = native.decode_tb_ops(
            packed, [pairs[i] for i in idxs], eqx=eqx
        )
        if decoded is None:
            # native lib unavailable: decode in numpy/python
            decoded = _decode_packed_python(
                packed, [pairs[i] for i in idxs], eqx=eqx
            )
        for b, i in enumerate(idxs):
            ops = decoded[b]
            cig = native.ops_to_cigar(ops)
            t, q = pairs[i]
            results[i] = AlignResult(cig, False, len(q), len(t), 0, 0, 0)


def _decode_packed_python(packed: np.ndarray, pairs, eqx: bool):
    """Reference decoder for the packed traceback streams (the C++
    decode_tb_ops is the production path)."""
    S4, B = packed.shape
    out = []
    # unpack to (S, B): step s = 4*g + k lives in bits 2k..2k+1 of byte g
    ops = np.zeros((S4 * 4, B), np.uint8)
    for k in range(4):
        ops[k::4] = (packed >> (2 * k)) & 3
    for b, (t, q) in enumerate(pairs):
        col = ops[:, b]
        col = col[col != 3]
        # emitted back-to-front
        col = col[::-1]
        runs = []
        i = j = 0
        for code in col:
            if code == 0:
                if eqx:
                    ch = 3 if (t[i] == q[j] and t[i] < 4) else 4
                else:
                    ch = 0
                i += 1
                j += 1
            elif code == 1:
                ch = 1
                j += 1
            else:
                ch = 2
                i += 1
            if runs and runs[-1][0] == ch:
                runs[-1][1] += 1
            else:
                runs.append([ch, 1])
        out.append(np.asarray(runs, np.int32).reshape(-1, 2))
    return out
