"""Batched non-linear chaining DP on device (JAX/XLA, TPU-first).

The host oracle (`chain_ref.chain_dp`) is sequential per read; on TPU we
instead run ONE jitted scan over anchor index for a whole BATCH of reads
at once: step i scores anchor i of every read against all of that read's
earlier anchors as a single masked vector reduction.  Data parallelism
across reads fills the VPU lanes; the scan carries the growing score
vector.  This computes exactly the same S/P as the reference recurrence
(the reference's descending-score early break is lossless — SURVEY.md
Appendix A.2), with the same predecessor tie-break (max S[j], then max j).

Scores are float32 on device (the reference uses float64; differences
only appear on near-exact ties — see DESIGN.md).

Layout:
  anchors  (B, N, 4) int32 — (readpos, refpos, strand, len), sorted by the
           variant barrier key, zero-padded
  n_valid  (B,) int32
Returns S (B, N) float32 and P (B, N) int32 (-1 = chain start).

Variants match chain_ref: "global" (adaptive repeat penalties),
"refund" (R mode ledger), "fine", "mismatch".
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def _extra_penalty(gapcost: jnp.ndarray) -> jnp.ndarray:
    """SV-move distance surcharge, computed closed-form instead of the
    reference's 162k-entry table (mammap_clrnano.py:15371-15376)."""
    g = jnp.maximum(gapcost.astype(jnp.float32), 1.0)
    gf = gapcost.astype(jnp.float32)
    return jnp.minimum(
        36.0,
        jnp.minimum(
            30.0 + 0.5 * jnp.log(g),
            jnp.minimum(10.0, gf / 100.0) + jnp.minimum(30.0, gf / 1000.0),
        ),
    )


def _gapcost_colinear(
    gapcost: jnp.ndarray, kmersize: int, local: bool
) -> jnp.ndarray:
    g = jnp.maximum(gapcost.astype(jnp.float32), 1.0)
    lg = jnp.log2(g)
    coef = jnp.where(jnp.logical_and(local, gapcost > 10), 2.0, 0.5)
    return jnp.where(
        gapcost > 0, 0.01 * kmersize * gapcost.astype(jnp.float32) + coef * lg, 0.0
    )


def _pair_scores(ai, Aj, Sj, skip_i, maxdiff_i, params):
    """Vectorized transition scores from candidate anchors Aj with chain
    scores Sj to anchor ai.  ai is a 4-tuple of scalars and Aj a 4-tuple
    of arrays — componentized so Pallas layouts avoid a padded size-4
    trailing dim.  Returns (test_scores, colinear, bonus).  Mirrors
    chain_ref._pair_geometry + the per-variant costs."""
    kmersize, maxgap, skipcost, variant = (
        params["kmersize"], params["maxgap"], params["skipcost"], params["variant"],
    )
    local = variant in ("fine", "mismatch")
    r_i, y_i, s_i, l_i = ai
    r_j, y_j, s_j, l_j = Aj
    raw_readgap = r_i - r_j - l_j
    neg = raw_readgap < 0
    bonus = jnp.where(neg, r_i + l_i - r_j - l_j, l_i)
    overlap = r_j + l_j - r_i
    readgap = jnp.maximum(raw_readgap, 0)
    same = s_j == s_i
    plus = s_i == 1
    j_minus = s_j == -1
    if params.get("asm_geo"):
        # asm-mode opposite-strand geometry (mammap_asm.py:20552 refgap
        # cases: non_overlap_size forms, no +-1); same-strand forms are
        # algebraically identical to clrnano's
        nov = r_i - r_j
        refgap_neg = jnp.where(
            same,
            jnp.where(plus, y_i + overlap - (y_j + l_j), y_j - (y_i + bonus)),
            jnp.where(j_minus, y_i + l_j - nov - y_j, y_i + l_i - y_j - nov),
        )
        refgap_pos = jnp.where(
            same,
            jnp.where(plus, y_i - y_j - l_j, y_j - y_i - l_i),
            jnp.where(j_minus, y_i - y_j, y_i + l_i - y_j - l_j),
        )
    else:
        refgap_neg = jnp.where(
            same,
            jnp.where(plus, y_i + overlap - (y_j + l_j), y_j - (y_i + bonus)),
            jnp.where(j_minus, y_i + overlap - y_j + 1, y_i + bonus - 1 - (y_j + l_j)),
        )
        refgap_pos = jnp.where(
            same,
            jnp.where(plus, y_i - y_j - l_j, y_j - y_i - l_i),
            jnp.where(j_minus, y_i - y_j + 1, y_i + l_i - 1 - y_j - l_j),
        )
    refgap = jnp.where(neg, refgap_neg, refgap_pos)
    gapcost = jnp.abs(readgap - refgap)
    colinear = same & (refgap >= 0) & (readgap <= maxgap) & (gapcost <= maxdiff_i)

    bonus_f = bonus.astype(jnp.float32)
    col = Sj + bonus_f - _gapcost_colinear(gapcost, kmersize, local)
    if variant == "fine":
        rg = jnp.minimum(readgap, 99).astype(jnp.float32)
        col = col - jnp.where(readgap > 0, 0.1 * jnp.log2(rg + 1.0), 0.0)
    elif variant == "mismatch":
        rgf = readgap.astype(jnp.float32)
        lrg = jnp.where(
            readgap >= 30, 0.5 * rgf, 0.1 * jnp.log2(rgf + 1.0)
        )
        col = col - jnp.where(readgap > 0, lrg, 0.0)

    if variant == "global":
        sv = Sj - skip_i + bonus_f - _extra_penalty(gapcost)
    elif variant == "refund":
        sv = Sj + bonus_f - skip_i
    elif variant == "fine":
        pen = jnp.where(same, skipcost, jnp.minimum(50.0, skipcost)) + _extra_penalty(
            gapcost
        )
        sv = Sj + bonus_f - pen
    else:  # mismatch
        gc = jnp.minimum(gapcost, 99999).astype(jnp.float32)
        sv = Sj + bonus_f - (skipcost + 0.5 * jnp.log2(gc + 1.0))

    test = jnp.where(colinear, col, sv)
    if local:
        test = jnp.where(neg & (bonus <= 0), NEG, test)
    return test, colinear, bonus


@functools.partial(
    jax.jit, static_argnames=("kmersize", "maxdiff", "maxgap", "variant")
)
def chain_scores_batch(
    anchors: jnp.ndarray,  # (B, N, 4) int32
    n_valid: jnp.ndarray,  # (B,) int32
    skip_i: jnp.ndarray,  # (B, N) float32 adaptive skipcost per anchor
    maxdiff_i: jnp.ndarray,  # (B, N) int32 adaptive maxdiff per anchor
    kmersize: int = 15,
    maxdiff: int = 50,
    maxgap: int = 1000,
    skipcost: float = 40.0,
    variant: str = "global",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact batched chaining DP; returns (S, P) of shape (B, N)."""
    asm_geo = variant == "global_nocov"
    if variant == "global_nocov":
        variant = "global"  # penalties already flat in skip_i/maxdiff_i
    B, N, _ = anchors.shape
    local = variant in ("fine", "mismatch")
    barrier = anchors[:, :, 0] + (anchors[:, :, 3] if local else 0)
    params = dict(
        kmersize=kmersize, maxgap=maxgap, skipcost=skipcost, variant=variant,
        asm_geo=asm_geo,
    )
    refund = variant == "refund"

    jidx = jnp.arange(N, dtype=jnp.int32)

    def step(carry, i):
        if refund:
            S, fixed_pen, pre_pen = carry
        else:
            (S,) = carry
        ai = anchors[:, i, :]  # (B, 4)
        test, colinear, bonus = jax.vmap(
            lambda a, Aj, Sj, sk, md: _pair_scores(
                (a[0], a[1], a[2], a[3]),
                (Aj[..., 0], Aj[..., 1], Aj[..., 2], Aj[..., 3]),
                Sj, sk, md, params,
            )
        )(ai, anchors, S, skip_i[:, i], maxdiff_i[:, i])
        if refund:
            refundable = (
                colinear & (fixed_pen < 0) & (fixed_pen + bonus.astype(jnp.float32) >= 0)
            )
            test = jnp.where(refundable, test + pre_pen, test)
        # candidate mask: earlier barrier group, valid anchor
        barrier_i = jnp.take(barrier, i, axis=1)[:, None]
        mask = (barrier < barrier_i) & (jidx[None, :] < n_valid[:, None])
        test = jnp.where(mask, test, NEG)
        l_i = ai[:, 3].astype(jnp.float32)
        m = jnp.max(test, axis=1)
        has_pred = m > l_i
        # tie-break: among argmax, highest S[j]; then largest j
        is_max = test == m[:, None]
        s_masked = jnp.where(is_max, S, NEG)
        s_best = jnp.max(s_masked, axis=1)
        cand = is_max & (S == s_best[:, None])
        p = jnp.max(jnp.where(cand, jidx[None, :], -1), axis=1)
        S_i = jnp.where(has_pred, m, l_i)
        P_i = jnp.where(has_pred, p, -1)
        active = i < n_valid
        S_i = jnp.where(active, S_i, 0.0)
        P_i = jnp.where(active, P_i, -1)
        S = S.at[:, i].set(S_i)
        if refund:
            pw = jnp.clip(P_i, 0, N - 1)
            win_col = jnp.take_along_axis(colinear, pw[:, None], axis=1)[:, 0]
            win_bonus = jnp.take_along_axis(bonus, pw[:, None], axis=1)[:, 0].astype(
                jnp.float32
            )
            fp_j = jnp.take_along_axis(fixed_pen, pw[:, None], axis=1)[:, 0]
            pp_j = jnp.take_along_axis(pre_pen, pw[:, None], axis=1)[:, 0]
            sk = skip_i[:, i]
            new_fp = jnp.where(
                win_col,
                jnp.where((fp_j < 0) & (fp_j + win_bonus < 0), fp_j + win_bonus, 0.0),
                -sk + win_bonus,
            )
            new_pp = jnp.where(
                win_col,
                jnp.where((fp_j < 0) & (fp_j + win_bonus < 0), pp_j, 0.0),
                sk,
            )
            ok = has_pred & active
            fixed_pen = fixed_pen.at[:, i].set(jnp.where(ok, new_fp, 0.0))
            pre_pen = pre_pen.at[:, i].set(jnp.where(ok, new_pp, 0.0))
            return (S, fixed_pen, pre_pen), P_i
        return (S,), P_i

    S0 = jnp.zeros((B, N), jnp.float32)
    init = (S0, jnp.zeros((B, N), jnp.float32), jnp.zeros((B, N), jnp.float32)) if refund else (S0,)
    carry, P_cols = jax.lax.scan(step, init, jnp.arange(N, dtype=jnp.int32))
    S = carry[0]
    P = jnp.transpose(P_cols)  # (B, N)
    return S, P


@functools.partial(
    jax.jit,
    static_argnames=("kmersize", "maxdiff", "maxgap", "skipcost", "variant"),
)
def chain_scores_batch_warm(
    anchors: jnp.ndarray,  # (B, N, 4) int32
    n_valid: jnp.ndarray,  # (B,) int32
    skip_i: jnp.ndarray,  # (B, N) float32
    maxdiff_i: jnp.ndarray,  # (B, N) int32
    warm_S: jnp.ndarray,  # (B, N) float32 — fixed scores of frontier rows
    warm_P: jnp.ndarray,  # (B, N) int32 — their (negative) pred codes
    n_warm: jnp.ndarray,  # (B,) int32
    kmersize: int = 15,
    maxdiff: int = 50,
    maxgap: int = 1000,
    skipcost: float = 40.0,
    variant: str = "global",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warm-start (frontier-carry) batched chaining for the streaming
    (asm long-contig) chain: the first n_warm rows per read are carried
    frontier anchors with FIXED scores and pass-through predecessor codes
    — they act as candidates but are never re-scored.  Device analog of
    the reference's linked_* DPs (mammap_asm.py:21505/:21687) and of the
    native chain_dp_native_warm kernel."""
    asm_geo = variant == "global_nocov"
    if variant == "global_nocov":
        variant = "global"  # penalties already flat in skip_i/maxdiff_i
    B, N, _ = anchors.shape
    local = variant in ("fine", "mismatch")
    barrier = anchors[:, :, 0] + (anchors[:, :, 3] if local else 0)
    params = dict(
        kmersize=kmersize, maxgap=maxgap, skipcost=skipcost, variant=variant,
        asm_geo=asm_geo,
    )
    jidx = jnp.arange(N, dtype=jnp.int32)

    def step(S, i):
        ai = anchors[:, i, :]
        test, _colinear, _bonus = jax.vmap(
            lambda a, Aj, Sj, sk, md: _pair_scores(
                (a[0], a[1], a[2], a[3]),
                (Aj[..., 0], Aj[..., 1], Aj[..., 2], Aj[..., 3]),
                Sj, sk, md, params,
            )
        )(ai, anchors, S, skip_i[:, i], maxdiff_i[:, i])
        barrier_i = jnp.take(barrier, i, axis=1)[:, None]
        mask = (barrier < barrier_i) & (jidx[None, :] < n_valid[:, None])
        test = jnp.where(mask, test, NEG)
        l_i = ai[:, 3].astype(jnp.float32)
        m = jnp.max(test, axis=1)
        has_pred = m > l_i
        is_max = test == m[:, None]
        s_masked = jnp.where(is_max, S, NEG)
        s_best = jnp.max(s_masked, axis=1)
        cand = is_max & (S == s_best[:, None])
        p = jnp.max(jnp.where(cand, jidx[None, :], -1), axis=1)
        S_i = jnp.where(has_pred, m, l_i)
        P_i = jnp.where(has_pred, p, -1)
        frozen = i < n_warm  # carried frontier rows keep their values
        active = (i < n_valid) & ~frozen
        S_col = jnp.take(S, i, axis=1)
        S = S.at[:, i].set(jnp.where(active, S_i, S_col))
        P_out = jnp.where(
            frozen, warm_P[:, i], jnp.where(active, P_i, -1)
        )
        return S, P_out

    S, P_cols = jax.lax.scan(
        step, warm_S.astype(jnp.float32), jnp.arange(N, dtype=jnp.int32)
    )
    return S, jnp.transpose(P_cols)


class JaxStreamChainBackend:
    """stream_chain-compatible device backend for the asm frontier-carry
    chain: one warm-start batched call per anchor block, N padded to
    power-of-two buckets so the jit shape universe stays bounded."""

    def __init__(self, max_anchors: int = 1 << 20):
        self.max_anchors = max_anchors
        self.calls = 0       # blocks offered to the device
        self.engaged = 0     # blocks the device actually chained
        self.device_s = 0.0  # wall spent in device calls (incl. transfer)

    def __call__(self, linked: np.ndarray, variant: str, kmersize: int,
                 skipcost: float, maxdiff: int, maxgap: int,
                 warm_S: np.ndarray, warm_P: np.ndarray):
        self.calls += 1
        n = len(linked)
        if n == 0 or n > self.max_anchors:
            return None
        if variant in ("scar", "asm_fine"):
            # device kernel doesn't implement the R/asm local variants;
            # the caller falls back to the native host DP
            return None
        if int(linked[:, 1].max()) >= 2**31:
            # int32 device anchors: >2^31 bp concatenated references must
            # use the host DP (reference: 64-bit twins, :23994)
            return None
        import time as _time

        t0 = _time.perf_counter()
        anchors, n_valid, skip_i, maxdiff_i = prepare_batch(
            [linked.astype(np.int64)], variant, skipcost, maxdiff
        )
        N = anchors.shape[1]
        w_S = np.zeros((1, N), np.float32)
        w_P = np.zeros((1, N), np.int32)
        w_S[0, : len(warm_S)] = warm_S
        w_P[0, : len(warm_P)] = warm_P
        S, P = chain_scores_batch_warm(
            anchors, n_valid, skip_i, maxdiff_i,
            jnp.asarray(w_S), jnp.asarray(w_P),
            jnp.asarray([len(warm_S)], np.int32),
            kmersize=kmersize, maxdiff=maxdiff, maxgap=maxgap,
            skipcost=skipcost, variant=variant,
        )
        out = (
            np.asarray(S, np.float64)[0][:n],
            np.asarray(P, np.int64)[0][:n],
        )
        self.engaged += 1
        self.device_s += _time.perf_counter() - t0
        return out


# ---------------------------------------------------------------------------
# host-facing wrapper
# ---------------------------------------------------------------------------


def prepare_batch(anchor_list, variant: str, skipcost: float, maxdiff: int):
    """Pad a list of per-read (n,4) anchor arrays (already barrier-sorted)
    into device inputs, computing the adaptive per-anchor penalties on
    host (cheap O(n) bincounts)."""
    B = len(anchor_list)
    N = max((len(a) for a in anchor_list), default=1)
    # "global_nocov" (asm): global scoring, flat penalties
    # bucket N to powers of two (>=128) so each (variant, N) pair compiles
    # exactly once per process
    N = max(128, 1 << int(np.ceil(np.log2(max(N, 1)))))
    anchors = np.zeros((B, N, 4), np.int32)
    n_valid = np.zeros(B, np.int32)
    skip_i = np.full((B, N), float(skipcost), np.float32)
    maxdiff_i = np.full((B, N), maxdiff, np.int32)
    for b, a in enumerate(anchor_list):
        n = len(a)
        n_valid[b] = n
        anchors[b, :n] = a
        if variant == "global" and n:
            rp = a[:, 0].astype(np.int64)
            cov = np.minimum(np.bincount(rp)[rp], 20)
            skip_i[b, :n] = skipcost + cov
            maxdiff_i[b, :n] = np.maximum(maxdiff - cov, 10)
        # "global_nocov" keeps the flat defaults
    return anchors, n_valid, skip_i, maxdiff_i


class JaxChainBackend:
    """chain_read/chain_local-compatible backend: per-call batch of one
    (the batched executor calls chain_scores_batch directly)."""

    def __init__(self, max_anchors: int = 65536):
        self.max_anchors = max_anchors

    def __call__(self, A: np.ndarray, variant: str, kmersize: int,
                 skipcost: float, maxdiff: int, maxgap: int):
        from .chain_ref import ChainResult

        if len(A) > self.max_anchors:
            return None  # fall back to host fast path
        if len(A) and int(A[:, 1].max()) >= 2**31:
            # device anchors are int32: concatenated references over
            # 2^31 bp (hg38-scale) would overflow — host DP handles these
            # (the reference switches to its _64 twins, :23994)
            return None
        anchors, n_valid, skip_i, maxdiff_i = prepare_batch(
            [A], variant, skipcost, maxdiff
        )
        S, P = chain_scores_batch(
            anchors, n_valid, skip_i, maxdiff_i,
            kmersize=kmersize, maxdiff=maxdiff, maxgap=maxgap,
            skipcost=skipcost, variant=variant,
        )
        n = len(A)
        # convert BEFORE slicing: eager slices of device arrays compile a
        # tiny jit per distinct shape (~0.4 s each on this platform)
        S = np.asarray(S, np.float64)[0][:n]
        P = np.asarray(P, np.int64)[0][:n]
        g = int(np.argmax(S)) if n else -1
        return ChainResult(g, S, P)
