import numpy as np
import pytest

from vacmap_tpu import native
from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.asm import STREAM_THRESHOLD, stream_chain
from vacmap_tpu.pipeline.mapper import Mapper
from tests.conftest import random_dna

pytestmark = pytest.mark.skipif(
    not native.available(), reason="asm streaming requires the native lib"
)


def test_stream_chain_matches_single_batch(rng):
    """Streaming in two batches must recover the same chain as one shot."""
    from vacmap_tpu.ops.chain_ref import chain_dp

    r = np.arange(0, 4000, 37)
    y = r + 12345 + rng.integers(-2, 3, len(r))
    a = np.stack([r, y, np.ones_like(r), np.full_like(r, 15)], 1).astype(np.int64)
    split = len(a) // 2
    path = stream_chain(
        iter([a[:split], a[split:]]), 15, 40.0, 50, 1000, "global", None
    )
    # one-shot reference
    res = chain_dp(a, 15, 40.0, 50, 1000, "global")
    full = []
    i = res.g_max_index
    while i != -1:
        full.append(tuple(int(x) for x in a[i]))
        i = int(res.P[i])
    # streaming path covers the same chain (frontier anchor may duplicate)
    dedup = []
    for item in path:
        if not dedup or dedup[-1] != item:
            dedup.append(item)
    assert dedup == full


def test_small_contig_normal_path(rng, small_genome):
    idx = ReferenceIndex.build(small_genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="asm"))
    contig = small_genome["c1"][2000:12000]
    lines = m.map_contig("ctg1", contig)
    assert len(lines) >= 1
    f = lines[0].split("\t")
    assert f[2] == "c1"
    assert abs(int(f[3]) - 2001) < 50


def test_streaming_contig(rng):
    genome = {"g1": random_dna(rng, 800_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    m = Mapper(idx, AlignerConfig(mode="asm"))
    # 600 kb contig (over the streaming threshold) with one 2 kb deletion
    src = genome["g1"][50_000:650_000]
    contig = src[:300_000] + src[302_000:]
    assert len(contig) >= STREAM_THRESHOLD
    lines = m.map_contig("bigctg", contig)
    assert len(lines) >= 1
    f = lines[0].split("\t")
    assert f[2] == "g1"
    assert abs(int(f[3]) - 50_001) < 100
    assert "D" in f[5] or "N" in f[5]  # the deletion appears in the cigar


def test_streaming_contig_disk_spill(rng, tmp_path):
    """Streaming asm with a workdir exercises the disk-spill frontier."""
    genome = {"g2": random_dna(rng, 700_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    import dataclasses

    cfg = dataclasses.replace(AlignerConfig(mode="asm"), workdir=str(tmp_path))
    m = Mapper(idx, cfg)
    contig = genome["g2"][50_000:600_000]
    lines = m.map_contig("spillctg", contig)
    assert lines
    f = lines[0].split("\t")
    assert abs(int(f[3]) - 50_001) < 100
    # workdir cleaned up afterwards
    import os

    assert not any("spillctg" in d for d in os.listdir(tmp_path))


def test_stream_chain_device_backend_matches_native(rng):
    """The warm-start device chain (JaxStreamChainBackend) reproduces the
    native streaming result — same frontier carry, same path — the
    device analog of the reference's linked_* DPs (mammap_asm.py:21687)."""
    from vacmap_tpu.ops.chain_jax import JaxStreamChainBackend

    r = np.arange(0, 6000, 23)
    y = r + 54321 + rng.integers(-3, 4, len(r))
    # an SV jump mid-chain exercises non-colinear moves across the carry
    y[len(y) // 2 :] += 40_000
    a = np.stack([r, y, np.ones_like(r), np.full_like(r, 15)], 1).astype(np.int64)
    batches = [a[: len(a) // 3], a[len(a) // 3 : 2 * len(a) // 3],
               a[2 * len(a) // 3 :]]
    p_native = stream_chain(
        iter(batches), 15, 40.0, 50, 1000, "global_nocov", None
    )
    p_device = stream_chain(
        iter(batches), 15, 40.0, 50, 1000, "global_nocov", None,
        chain_backend=JaxStreamChainBackend(),
    )
    assert p_device == p_native
    assert len(p_device) > 50


def test_streaming_contig_device_backend_production(rng):
    """Production wiring (round-5, VERDICT item 3): a Mapper built with
    --backend jax runs map_contig_streaming with JaxStreamChainBackend
    engaged on the round-1 global blocks, records identical to the host
    path.  (Sparse w keeps the CPU-mesh device DP small.)"""
    genome = {"g3": random_dna(rng, 800_000)}
    idx = ReferenceIndex.build(genome, k=15, w=64)
    src = genome["g3"][50_000:650_000]
    contig = src[:300_000] + src[302_000:]  # one 2 kb deletion
    assert len(contig) >= STREAM_THRESHOLD
    want = Mapper(idx, AlignerConfig(mode="asm")).map_contig("dctg", contig)
    m_dev = Mapper(idx, AlignerConfig(mode="asm", backend="jax"))
    assert m_dev.stream_backend is not None
    got = m_dev.map_contig("dctg", contig)
    assert m_dev.stream_backend.engaged > 0
    assert got == want
