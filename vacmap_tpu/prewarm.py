"""Pre-warm the persistent XLA/Mosaic compilation cache.

    python -m vacmap_tpu.prewarm [--fills] [--chain] [--all]

A cache-cold production run eats the Mosaic fill-kernel compiles
(minutes per shape on a relay-attached chip) at startup; this tool
populates ``~/.cache/vacmap_tpu_xla`` (or $VACMAP_TPU_CACHE) with the
shipped shape universe once per machine so every later CLI / service
start is seconds.  Counterpart of the reference's (dead) numba warm-up
call (mammap_clrnano.py JIT warm-up); here the warm state is a real
on-disk artifact shared by all processes.

Shapes compiled:
  fills  — the fill service's dispatch shapes (fill_service.DEFAULT_SHAPE_B)
  chain  — the batched executor's chain-scan buckets (executor.N_BUCKETS)
  asm    — the asm streaming warm-start chain buckets (global_nocov,
           N=1024..32768; cold compiles stall deploys on congested
           relay compile queues)
"""

from __future__ import annotations

import argparse
import sys
import time


def prewarm_fills(full: bool = True) -> None:
    """Compile the fill service's WHOLE dispatch-shape universe: both
    buckets x (banded + full-width) x every ladder rung.  The service
    itself compiles only the top rung per bucket before going ready and
    fills in the rest during traffic idle gaps — running this once per
    machine makes those background compiles (and any later service
    start) pure persistent-cache hits."""
    from .ops.affine_pallas import BANDED, PallasFillAligner, batch_ladder
    from .parallel.fill_service import DEFAULT_SHAPE_B

    pa = PallasFillAligner()
    for bucket, Bmax in sorted(DEFAULT_SHAPE_B.items()):
        ids = ([bucket | BANDED, bucket] if pa.banded else [bucket])
        for bid in ids:
            rungs = batch_ladder(bucket, Bmax) if full else [Bmax]
            for B in sorted(rungs, reverse=True):
                t0 = time.time()
                pa.prewarm(batch_sizes=(B,), buckets=(bid,))
                name = (f"banded {bucket}" if bid & BANDED else f"{bucket}")
                print(f"fill kernel (B={B}, N={name}): "
                      f"{time.time() - t0:.1f}s", flush=True)


def prewarm_chain() -> None:
    import numpy as np

    from .ops.chain_jax import chain_scores_batch, prepare_batch
    from .pipeline.executor import N_BUCKETS

    rng = np.random.default_rng(0)
    for n in N_BUCKETS:
        t0 = time.time()
        a = np.zeros((n, 4), np.int32)
        a[:, 0] = np.sort(rng.integers(0, 10_000, n))
        a[:, 1] = rng.integers(0, 10_000, n)
        a[:, 3] = 15
        for variant in ("global", "fast"):
            batch = prepare_batch([a], variant, 40.0, 50)
            S, P = chain_scores_batch(*batch)
            S.block_until_ready()
        print(f"chain scan (N={n}): {time.time() - t0:.1f}s", flush=True)


def prewarm_asm_stream(max_n: int = 1 << 15) -> None:
    """asm streaming chain shapes: the warm-start frontier-carry kernel
    (chain_scores_batch_warm, variant global_nocov) compiles per anchor-
    block bucket at first contact — on a congested relay compile queue
    that is minutes of deploy stall (measured round 5: a cold 12 Mb
    contig run sat >15 min behind the queue).  100 kb blocks at w=10
    produce ~16-33k anchors, so buckets up to 32768 are the production
    set."""
    import numpy as np

    import jax.numpy as jnp

    from .ops.chain_jax import chain_scores_batch_warm, prepare_batch

    rng = np.random.default_rng(0)
    n = 1024
    while n <= max_n:
        t0 = time.time()
        a = np.zeros((n, 4), np.int64)
        a[:, 0] = np.sort(rng.integers(0, 100_000, n))
        a[:, 1] = rng.integers(0, 1_000_000, n)
        a[:, 3] = 15
        anchors, n_valid, skip_i, maxdiff_i = prepare_batch(
            [a], "global_nocov", 40.0, 50)
        N = anchors.shape[1]
        w_S = np.zeros((1, N), np.float32)
        w_P = np.zeros((1, N), np.int32)
        S, P = chain_scores_batch_warm(
            anchors, n_valid, skip_i, maxdiff_i,
            jnp.asarray(w_S), jnp.asarray(w_P),
            jnp.asarray([0], np.int32),
            kmersize=15, maxdiff=50, maxgap=1000, skipcost=40.0,
            variant="global_nocov",
        )
        S.block_until_ready()
        print(f"asm stream chain (N={N}): {time.time() - t0:.1f}s",
              flush=True)
        n *= 2


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vacmap-tpu prewarm",
                                description=__doc__.splitlines()[0])
    p.add_argument("--fills", action="store_true")
    p.add_argument("--chain", action="store_true")
    p.add_argument("--asm", action="store_true")
    p.add_argument("--all", action="store_true")
    args = p.parse_args(argv)
    if not (args.fills or args.chain or args.asm):
        args.all = True
    import jax

    from .parallel import runtime

    runtime.enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    if jax.default_backend() == "cpu":
        print("no accelerator: nothing to prewarm for the Mosaic kernels")
        if not (args.all or args.chain):
            return 0
    t0 = time.time()
    if args.all or args.fills:
        if jax.default_backend() != "cpu":
            prewarm_fills()
    if args.all or args.chain:
        prewarm_chain()
    if args.all or args.asm:
        prewarm_asm_stream()
    print(f"cache warm in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
