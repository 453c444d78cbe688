"""Batched two-piece affine alignment on device (JAX/XLA, TPU-first).

Device counterpart of `affine_ref.align2p`: many (target, query) pairs
are aligned at once; the DP runs as one `lax.scan` over target rows with
the band as the vectorized lane dimension (same row formulation as the
host oracle, so results are directly comparable).  Traceback bits for
every row are emitted to HBM as a scan output; the (cheap, O(path))
traceback itself runs on host over the fetched bits.

Used for both parameterizations the pipeline needs
(mammap_clrnano.py:2381 banded zdrop edge extension, :21554 global
inter-anchor fill).  Pairs whose length difference exceeds the bucket
band fall back to the host aligner.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .affine_ref import (
    _DIAG,
    _DEL1,
    _DEL2,
    _E1X,
    _E2X,
    _F1X,
    _F2X,
    _INS1,
    _INS2,
    AlignResult,
    _expand_eqx,
    _traceback,
    align2p,
)

NEG = jnp.float32(-1e9)


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "match", "mismatch", "o1", "e1", "o2", "e2", "zdrop", "glob",
    ),
)
def _affine_batch(
    targets: jnp.ndarray,  # (B, T) uint8 codes (4 = pad)
    queries: jnp.ndarray,  # (B, Q) uint8
    t_len: jnp.ndarray,  # (B,)
    q_len: jnp.ndarray,  # (B,)
    W: int,
    match: int = 2,
    mismatch: int = -4,
    o1: int = 4,
    e1: int = 2,
    o2: int = 24,
    e2: int = 1,
    zdrop: int = -1,
    glob: bool = True,
):
    B, T = targets.shape
    Q = queries.shape[1]
    lanes = jnp.arange(W, dtype=jnp.int32)
    # per-pair band start so the band always contains the end cell:
    # offset d = j - i in [dlo, dlo + W)
    dlo = jnp.minimum(0, q_len - t_len) - (W - (jnp.abs(q_len - t_len) + 1)) // 2
    dlo = jnp.maximum(dlo, -t_len)  # (B,)

    f_o1, f_e1 = jnp.float32(o1), jnp.float32(e1)
    f_o2, f_e2 = jnp.float32(o2), jnp.float32(e2)
    f_mat, f_mis = jnp.float32(match), jnp.float32(mismatch)

    j0 = lanes[None, :] + dlo[:, None]  # (B, W)
    inb0 = (j0 >= 0) & (j0 <= q_len[:, None])
    gap0 = jnp.minimum(f_o1 + f_e1 * j0, f_o2 + f_e2 * j0)
    H0row = jnp.where(
        inb0 & (j0 > 0), -gap0, jnp.where(j0 == 0, 0.0, NEG)
    ).astype(jnp.float32)

    def step(carry, i):
        H_prev, E1_prev, E2_prev, best, best_i, best_j, dead = carry
        j_here = lanes[None, :] + i + dlo[:, None]  # (B, W)
        inb = (j_here >= 1) & (j_here <= q_len[:, None]) & (i <= t_len[:, None])
        qi = jnp.take_along_axis(
            queries, jnp.clip(j_here - 1, 0, Q - 1), axis=1
        )
        ti = jnp.take_along_axis(
            targets, jnp.clip(jnp.full((B, 1), i - 1), 0, T - 1), axis=1
        )
        sub = jnp.where(qi == ti, f_mat, f_mis)
        diag = H_prev + sub
        shift = lambda x: jnp.concatenate([x[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        H_up, E1u, E2u = shift(H_prev), shift(E1_prev), shift(E2_prev)
        E1 = jnp.maximum(E1u - f_e1, H_up - f_o1 - f_e1)
        E2 = jnp.maximum(E2u - f_e2, H_up - f_o2 - f_e2)
        H0 = jnp.maximum(diag, jnp.maximum(E1, E2))
        gapi = jnp.minimum(f_o1 + f_e1 * i, f_o2 + f_e2 * i)
        H0 = jnp.where(j_here == 0, -gapi, H0)
        okc = inb | (j_here == 0)
        idxf = lanes.astype(jnp.float32)[None, :]
        base1 = jnp.where(okc, H0, NEG) + idxf * f_e1
        run1 = jax.lax.cummax(base1, axis=1)
        F1 = (
            jnp.concatenate([jnp.full((B, 1), NEG), run1[:, :-1]], axis=1)
            - idxf * f_e1
            - f_o1
        )
        base2 = jnp.where(okc, H0, NEG) + idxf * f_e2
        run2 = jax.lax.cummax(base2, axis=1)
        F2 = (
            jnp.concatenate([jnp.full((B, 1), NEG), run2[:, :-1]], axis=1)
            - idxf * f_e2
            - f_o2
        )
        H = jnp.maximum(H0, jnp.maximum(F1, F2))
        H = jnp.where(j_here == 0, -gapi, H)
        H = jnp.where(okc, H, NEG)

        op = jnp.full((B, W), _DIAG, jnp.uint8)
        op = jnp.where(H == F2, jnp.uint8(_INS2), jnp.where(H == F1, jnp.uint8(_INS1), op))
        op = jnp.where(H == E2, jnp.uint8(_DEL2), jnp.where(H == E1, jnp.uint8(_DEL1), op))
        op = jnp.where(H == diag, jnp.uint8(_DIAG), op)
        bits = op
        bits = bits | jnp.where(E1 == E1u - f_e1, jnp.uint8(_E1X), jnp.uint8(0))
        bits = bits | jnp.where(E2 == E2u - f_e2, jnp.uint8(_E2X), jnp.uint8(0))
        F1p = jnp.concatenate([jnp.full((B, 1), NEG), F1[:, :-1]], axis=1)
        F2p = jnp.concatenate([jnp.full((B, 1), NEG), F2[:, :-1]], axis=1)
        bits = bits | jnp.where(F1 == F1p - f_e1, jnp.uint8(_F1X), jnp.uint8(0))
        bits = bits | jnp.where(F2 == F2p - f_e2, jnp.uint8(_F2X), jnp.uint8(0))

        Hm = jnp.where(inb, H, NEG)
        row_best_p = jnp.argmax(Hm, axis=1)
        row_best = jnp.take_along_axis(Hm, row_best_p[:, None], axis=1)[:, 0]
        improved = (row_best > best) & ~dead & (i <= t_len)
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, i, best_i)
        best_j = jnp.where(
            improved,
            jnp.take_along_axis(j_here, row_best_p[:, None], axis=1)[:, 0],
            best_j,
        )
        if not glob and zdrop >= 0:
            dead = dead | ((best - row_best > zdrop) & (i <= t_len))
        # extension mode needs no traceback: skip the (B, T, W) HBM write
        out_bits = bits if glob else jnp.uint8(0)
        return (H, E1, E2, best, best_i, best_j, dead), out_bits

    init = (
        H0row,
        jnp.full((B, W), NEG),
        jnp.full((B, W), NEG),
        jnp.full((B,), NEG),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
    )
    carry, tb = jax.lax.scan(step, init, jnp.arange(1, T + 1, dtype=jnp.int32))
    H_last, _, _, best, best_i, best_j, dead = carry
    if glob:
        # (note: AlignResult.score in glob mode reports the max cell, not
        # the end cell; the pipeline only consumes the cigar there)
        tb = jnp.transpose(tb, (1, 0, 2))  # (B, T, W)
    return tb, best, best_i, best_j, dead, dlo


class BatchAligner:
    """Host-facing batched aligner with bucketed shapes and host traceback.

    mode 'global': full end-to-end cigars (bw implicit from bucket band).
    mode 'extend': zdrop extension; only (q_end, t_end) are used by the
    caller so traceback is skipped.
    """

    def __init__(
        self,
        match=2, mismatch=-4, o1=4, e1=2, o2=24, e2=1,
        zdrop=-1, glob=True,
        len_buckets: Sequence[int] = None,
        max_batch: int = 64,
    ):
        self.kw = dict(match=match, mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2)
        self.zdrop = zdrop
        self.glob = glob
        if len_buckets is None:
            # global fills keep full traceback rows in HBM: cap sizes;
            # extension mode (no traceback) handles up to full edge extends
            len_buckets = (256, 512, 1024, 2048, 4096) if glob else (
                512, 2048, 8192, 32768,
            )
        self.len_buckets = list(len_buckets)
        self.max_batch = max_batch

    def _bucket(self, n: int) -> int:
        for b in self.len_buckets:
            if n <= b:
                return b
        return -1

    def _band_for(self, bucket: int) -> int:
        if bucket <= 512:
            return 128
        if bucket <= 4096:
            return 256
        return 512

    def align_batch(self, pairs: List[Tuple[np.ndarray, np.ndarray]], eqx=False):
        """pairs: list of (target_codes, query_codes).  Returns a list of
        AlignResult in input order."""
        results: List[Optional[AlignResult]] = [None] * len(pairs)
        groups = {}
        for i, (t, q) in enumerate(pairs):
            tb_ = self._bucket(len(t))
            qb_ = self._bucket(len(q))
            bucket = max(tb_, qb_)
            # the band must contain |Q-T| + drift margin; else host fallback
            if (
                tb_ < 0
                or qb_ < 0
                or abs(len(q) - len(t)) + 64 > self._band_for(bucket)
                or len(t) == 0
                or len(q) == 0
            ):
                results[i] = align2p(
                    t, q,
                    match=self.kw["match"], mismatch=self.kw["mismatch"],
                    gap_open_1=self.kw["o1"], gap_extend_1=self.kw["e1"],
                    gap_open_2=self.kw["o2"], gap_extend_2=self.kw["e2"],
                    bw=-1 if self.glob else 256,
                    zdrop=self.zdrop, eqx=eqx,
                )
                continue
            groups.setdefault(bucket, []).append(i)
        for bucket, idxs in groups.items():
            # bound the (B, T, W) traceback buffer to ~128 MB
            if self.glob:
                max_b = max(1, (128 << 20) // (bucket * self._band_for(bucket)))
                max_b = min(max_b, self.max_batch)
            else:
                max_b = self.max_batch
            for chunk_start in range(0, len(idxs), max_b):
                chunk = idxs[chunk_start : chunk_start + max_b]
                self._run_group(pairs, chunk, bucket, eqx, results)
        return results

    def _run_group(self, pairs, idxs, bucket, eqx, results):
        B = len(idxs)
        T = Q = bucket
        targets = np.full((B, T), 4, np.uint8)
        queries = np.full((B, Q), 4, np.uint8)
        t_len = np.zeros(B, np.int32)
        q_len = np.zeros(B, np.int32)
        for b, i in enumerate(idxs):
            t, q = pairs[i]
            targets[b, : len(t)] = t
            queries[b, : len(q)] = q
            t_len[b] = len(t)
            q_len[b] = len(q)
        tb, best, best_i, best_j, dead, dlo = _affine_batch(
            jnp.asarray(targets), jnp.asarray(queries),
            jnp.asarray(t_len), jnp.asarray(q_len),
            W=self._band_for(bucket), zdrop=self.zdrop, glob=self.glob, **self.kw,
        )
        best = np.asarray(best)
        best_i = np.asarray(best_i)
        best_j = np.asarray(best_j)
        dead = np.asarray(dead)
        dlo = np.asarray(dlo)
        if not self.glob:
            # extension mode: caller only uses (q_end, t_end)
            for b, i in enumerate(idxs):
                results[i] = AlignResult(
                    "", bool(dead[b]), int(best_j[b]), int(best_i[b]), 0, 0,
                    int(round(float(best[b]))),
                )
            return
        tb_np = np.asarray(tb)
        for b, i in enumerate(idxs):
            t, q = pairs[i]
            cig, n_del, n_ins = _traceback(
                tb_np[b], len(t), len(q), int(dlo[b]),
                float(self.kw["e1"]), float(self.kw["e2"]),
            )
            if eqx:
                cig = _expand_eqx(cig, t, q, len(t), len(q))
            results[i] = AlignResult(
                cig, False, len(q), len(t), n_del, n_ins,
                int(round(float(best[b]))),
            )

    # single-pair convenience hook matching the refine_chain aligner API
    def __call__(self, t: np.ndarray, q: np.ndarray, eqx: bool = False):
        return self.align_batch([(t, q)], eqx=eqx)[0]
