"""Pallas TPU kernel for the non-linear chaining DP.

Same recurrence as ops/chain_jax.chain_scores_batch, but as a single
Pallas kernel: the anchor block, score vector and predecessor vector
live in VMEM for the whole DP, and the per-anchor iteration is a
`fori_loop` inside the kernel — no XLA scan per-step overhead, no HBM
round-trips between steps.  The batch dimension rides the VPU sublanes;
candidates ride the lanes.

Grid: one program per batch tile of BB reads.  Each program runs the
full N-step DP for its BB reads.  Variants: global / fine / mismatch
(the R-mode refund ledger keeps the lax.scan implementation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_jax import NEG, _pair_scores

BB = 8  # default reads per program (VPU sublane tile)


def _bb_for(N: int, B: int) -> int:
    """Wider programs amortize the sequential anchor loop across more
    sublanes; VMEM (~12 arrays of (bb, N) int32/f32) bounds bb at large
    N.  Never wider than the batch itself."""
    # measured on v5e (DESIGN.md): wider tiles LOSE above N~2048 (VMEM
    # pressure / layout spills dominate); 8 is robust across sizes
    return 8


def _chain_kernel(
    rpos_ref,  # (BB, N) int32 VMEM — anchor readpos
    ypos_ref,  # (BB, N) int32 — anchor refpos
    strand_ref,  # (BB, N) int32
    length_ref,  # (BB, N) int32
    n_valid_ref,  # (BB, 1) int32
    skip_ref,  # (BB, N) float32
    maxdiff_ref,  # (BB, N) int32
    S_ref,  # out (BB, N) float32
    P_ref,  # out (BB, N) int32
    *,
    BB: int,
    N: int,
    kmersize: int,
    maxgap: int,
    skipcost: float,
    variant: str,
):
    local = variant in ("fine", "mismatch")
    params = dict(
        kmersize=kmersize, maxgap=maxgap, skipcost=skipcost, variant=variant
    )
    r_all = rpos_ref[:, :]
    y_all = ypos_ref[:, :]
    s_all = strand_ref[:, :]
    l_all = length_ref[:, :]
    n_valid = n_valid_ref[:, 0]
    barrier = r_all + (l_all if local else 0)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    valid_j = jidx < n_valid[:, None]

    skip_full = skip_ref[:, :]
    maxdiff_full = maxdiff_ref[:, :]

    def step(i, carry):
        # Mosaic has no unaligned dynamic slicing: every per-i value is
        # extracted with a full-width masked reduction, and S/P ride the
        # loop carry with masked updates.
        S, P = carry
        sel = jidx == i  # (BB, N)
        r_i = jnp.sum(jnp.where(sel, r_all, 0), axis=1)
        y_i = jnp.sum(jnp.where(sel, y_all, 0), axis=1)
        s_i = jnp.sum(jnp.where(sel, s_all, 0), axis=1)
        l_i_v = jnp.sum(jnp.where(sel, l_all, 0), axis=1)
        sk = jnp.sum(jnp.where(sel, skip_full, 0.0), axis=1)
        md = jnp.sum(jnp.where(sel, maxdiff_full, 0), axis=1)
        test, _colinear, _bonus = jax.vmap(
            lambda a0, a1, a2, a3, r, y, st, ln, Sj, s, m_: _pair_scores(
                (a0, a1, a2, a3), (r, y, st, ln), Sj, s, m_, params
            )
        )(r_i, y_i, s_i, l_i_v, r_all, y_all, s_all, l_all, S, sk, md)
        ai = jnp.stack([r_i, y_i, s_i, l_i_v], axis=1)
        barrier_i = ai[:, 0] + (ai[:, 3] if local else 0)
        mask = (barrier < barrier_i[:, None]) & valid_j
        test = jnp.where(mask, test, NEG)
        l_i = ai[:, 3].astype(jnp.float32)
        m = jnp.max(test, axis=1)
        has_pred = m > l_i
        is_max = test == m[:, None]
        s_best = jnp.max(jnp.where(is_max, S, NEG), axis=1)
        cand = is_max & (S == s_best[:, None])
        p = jnp.max(jnp.where(cand, jidx, -1), axis=1)
        active = i < n_valid
        S_i = jnp.where(active, jnp.where(has_pred, m, l_i), 0.0)
        P_i = jnp.where(active & has_pred, p, -1)
        S = jnp.where(sel, S_i[:, None], S)
        P = jnp.where(sel, P_i[:, None], P)
        return S, P

    S0 = jnp.zeros((BB, N), jnp.float32)
    P0 = jnp.full((BB, N), -1, jnp.int32)
    S, P = jax.lax.fori_loop(0, N, step, (S0, P0))
    S_ref[:, :] = S
    P_ref[:, :] = P


@functools.partial(
    jax.jit,
    static_argnames=(
        "kmersize", "maxdiff", "maxgap", "skipcost", "variant", "interpret",
        "bb",
    ),
)
def chain_scores_pallas(
    anchors: jnp.ndarray,  # (B, N, 4) int32, B % BB == 0
    n_valid: jnp.ndarray,  # (B,) int32
    skip_i: jnp.ndarray,  # (B, N) float32
    maxdiff_i: jnp.ndarray,  # (B, N) int32
    kmersize: int = 15,
    maxdiff: int = 50,
    maxgap: int = 1000,
    skipcost: float = 40.0,
    variant: str = "global",
    interpret: bool = False,
    bb: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if variant == "global_nocov":
        variant = "global"  # penalties already flat in skip_i/maxdiff_i
    B, N, _ = anchors.shape
    BB = bb or _bb_for(N, B)
    assert B % BB == 0, "pad batch to a multiple of the program tile"
    grid = (B // BB,)
    kernel = functools.partial(
        _chain_kernel,
        BB=BB,
        N=N,
        kmersize=kmersize,
        maxgap=maxgap,
        skipcost=skipcost,
        variant=variant,
    )
    bn = lambda b: (b, 0)
    vspec = pl.BlockSpec((BB, N), bn, memory_space=pltpu.VMEM)
    S, P = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec, vspec, vspec, vspec,
            pl.BlockSpec((BB, 1), bn, memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.int32),
        ),
        interpret=interpret,
    )(
        anchors[:, :, 0], anchors[:, :, 1], anchors[:, :, 2], anchors[:, :, 3],
        n_valid[:, None], skip_i, maxdiff_i,
    )
    return S, P


def _chain_kernel_lm(
    rpos_ref,  # (N, B) int32 — candidates on SUBLANES, reads on LANES
    ypos_ref,
    strand_ref,
    length_ref,
    n_valid_ref,  # (1, B) int32
    skip_ref,  # (N, B) float32
    maxdiff_ref,  # (N, B) int32
    S_ref,  # out (N, B) float32
    P_ref,  # out (N, B) int32
    *,
    N: int,
    B: int,
    kmersize: int,
    maxgap: int,
    skipcost: float,
    variant: str,
):
    """Lane-major chaining DP (VERDICT round-2 item 5).

    The batch-major kernel had to extract anchor i's fields with
    full-width masked reductions (no dynamic LANE slicing in this Mosaic
    build) and ran one tb=8 tile per program — the sequential N-step loop
    repeated B/8 times.  Lane-major puts the batch on the 128 lanes and
    candidates on sublanes: anchor i's fields are a (1, B) dynamic
    SUBLANE slice (supported), the j-reductions are cross-sublane, and
    ONE program runs the whole N-step DP for 128 reads."""
    local = variant in ("fine", "mismatch")
    params = dict(
        kmersize=kmersize, maxgap=maxgap, skipcost=skipcost, variant=variant
    )
    r_all = rpos_ref[:, :]
    y_all = ypos_ref[:, :]
    s_all = strand_ref[:, :]
    l_all = length_ref[:, :]
    n_valid = n_valid_ref[:, :]  # (1, B)
    barrier = r_all + (l_all if local else 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
    # tie the iota to an input: replicated layouts cannot cross loop
    # back-edges in this Mosaic build (see affine_pallas._fill_tb_kernel)
    ridx = jnp.where(r_all < -(2**30), 0, ridx)
    valid_j = ridx < n_valid

    def step(i, carry):
        S, P = carry
        r_i = rpos_ref[pl.ds(i, 1), :]  # (1, B)
        y_i = ypos_ref[pl.ds(i, 1), :]
        s_i = strand_ref[pl.ds(i, 1), :]
        l_i = length_ref[pl.ds(i, 1), :]
        sk = skip_ref[pl.ds(i, 1), :]
        md = maxdiff_ref[pl.ds(i, 1), :]
        test, _colinear, _bonus = _pair_scores(
            (r_i, y_i, s_i, l_i), (r_all, y_all, s_all, l_all), S, sk, md,
            params,
        )
        barrier_i = r_i + (l_i if local else 0)  # (1, B)
        mask = (barrier < barrier_i) & valid_j
        test = jnp.where(mask, test, NEG)
        l_i_f = l_i.astype(jnp.float32)
        m = jnp.max(test, axis=0, keepdims=True)  # (1, B)
        has_pred = m > l_i_f
        is_max = test == m
        s_best = jnp.max(jnp.where(is_max, S, NEG), axis=0, keepdims=True)
        cand = is_max & (S == s_best)
        p = jnp.max(jnp.where(cand, ridx, -1), axis=0, keepdims=True)
        active = i < n_valid
        S_i = jnp.where(active, jnp.where(has_pred, m, l_i_f), 0.0)
        P_i = jnp.where(active & has_pred, p, -1)
        at = ridx == i
        S = jnp.where(at, S_i, S)
        P = jnp.where(at, P_i, P)
        return S, P

    S0 = jnp.zeros((N, B), jnp.float32)
    P0 = jnp.full((N, B), -1, jnp.int32)
    S, P = jax.lax.fori_loop(0, N, step, (S0, P0))
    S_ref[:, :] = S
    P_ref[:, :] = P


LM_B = 128  # reads per program = the VPU lane width


@functools.partial(
    jax.jit,
    static_argnames=(
        "kmersize", "maxdiff", "maxgap", "skipcost", "variant", "interpret",
    ),
)
def chain_scores_pallas_lm(
    anchors_t: jnp.ndarray,  # (4, N, B) int32: rpos/ypos/strand/len planes
    n_valid: jnp.ndarray,  # (B,) int32, B % LM_B == 0
    skip_t: jnp.ndarray,  # (N, B) float32
    maxdiff_t: jnp.ndarray,  # (N, B) int32
    kmersize: int = 15,
    maxdiff: int = 50,
    maxgap: int = 1000,
    skipcost: float = 40.0,
    variant: str = "global",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major chain DP; returns S (B, N) float32 and P (B, N) int32
    (transposed back to the batch-major convention)."""
    if variant == "global_nocov":
        variant = "global"
    _, N, B = anchors_t.shape
    assert B % LM_B == 0, "pad batch to a multiple of 128 lanes"
    grid = (B // LM_B,)
    kernel = functools.partial(
        _chain_kernel_lm,
        N=N,
        B=LM_B,
        kmersize=kmersize,
        maxgap=maxgap,
        skipcost=skipcost,
        variant=variant,
    )
    bn = lambda b: (0, b)
    vspec = pl.BlockSpec((N, LM_B), bn, memory_space=pltpu.VMEM)
    S, P = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, LM_B), bn, memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.int32),
        ),
        interpret=interpret,
    )(
        anchors_t[0], anchors_t[1], anchors_t[2], anchors_t[3],
        n_valid[None, :], skip_t, maxdiff_t,
    )
    return S.T, P.T


def pad_for_pallas_lm(anchors, n_valid, skip_i, maxdiff_i):
    """Batch-major (B, N, 4) inputs -> lane-major planes padded to a
    multiple of 128 reads.  Returns (anchors_t, n_valid, skip_t,
    maxdiff_t, B_orig)."""
    B = anchors.shape[0]
    Bp = ((B + LM_B - 1) // LM_B) * LM_B
    if Bp != B:
        pad = Bp - B
        anchors = np.pad(anchors, ((0, pad), (0, 0), (0, 0)))
        n_valid = np.pad(n_valid, (0, pad))
        skip_i = np.pad(skip_i, ((0, pad), (0, 0)))
        maxdiff_i = np.pad(maxdiff_i, ((0, pad), (0, 0)))
    anchors_t = np.ascontiguousarray(anchors.transpose(2, 1, 0))
    skip_t = np.ascontiguousarray(skip_i.T)
    maxdiff_t = np.ascontiguousarray(maxdiff_i.T)
    return anchors_t, n_valid, skip_t, maxdiff_t, B


def pad_for_pallas(anchors, n_valid, skip_i, maxdiff_i, bb: int = 0):
    """Pad the batch dim to a multiple of the program tile."""
    B = anchors.shape[0]
    t = bb or _bb_for(anchors.shape[1], max(B, 1))
    t = max(t, 32)  # pad enough for any tile choice downstream
    Bp = ((B + t - 1) // t) * t
    if Bp != B:
        pad = Bp - B
        anchors = np.pad(anchors, ((0, pad), (0, 0), (0, 0)))
        n_valid = np.pad(n_valid, (0, pad))
        skip_i = np.pad(skip_i, ((0, pad), (0, 0)))
        maxdiff_i = np.pad(maxdiff_i, ((0, pad), (0, 0)))
    return anchors, n_valid, skip_i, maxdiff_i, B
