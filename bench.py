"""vacmap-tpu benchmark: maps synthetic ONT-like reads end-to-end and
reports aligned-bases throughput vs the reference CPU baseline.

Baseline (BASELINE.md): reference VACmap maps HG002 50x ONT — ~155 Gbp —
in 5.8 h on 40 CPU threads = 7.42 Mbp/s.  vs_baseline is our Mbp/s over
that number.

Prints exactly ONE JSON line:
  {"metric": "e2e_throughput_mbp_per_s", "value": ..., "unit": "Mbp/s",
   "vs_baseline": ..., ...extra diagnostics...}
"""

import json
import sys
import time

import numpy as np

BASELINE_MBP_PER_S = 7.42
GENOME_MB = 2.0
N_READS = 64
READ_LEN = 20_000
ERR = 0.05


def make_genome(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


def mutate(rng, s, err):
    """ONT-like errors: ~40% mismatch, 30% ins, 30% del."""
    out = []
    i = 0
    arr = list(s)
    bases = "ACGT"
    while i < len(arr):
        r = rng.random()
        if r < err * 0.4:
            out.append(bases[rng.integers(0, 4)])
            i += 1
        elif r < err * 0.7:
            out.append(arr[i])
            out.append(bases[rng.integers(0, 4)])
            i += 1
        elif r < err:
            i += 1
        else:
            out.append(arr[i])
            i += 1
    return "".join(out)


def revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


_G = {}


def _map_chunk(chunk_id):
    from vacmap_tpu.pipeline.mapper import Mapper

    # index/config shared with the workers by fork COW (same shape as the
    # CLI deployment, cli.py worker processes)
    m = Mapper(_G["idx"], _G["cfg"])
    return [1 if m.map_read(n, s) else 0 for n, s in _G["chunks"][chunk_id]]


def main():
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.index import ReferenceIndex
    from vacmap_tpu.pipeline.mapper import Mapper

    rng = np.random.default_rng(20260816)
    glen = int(GENOME_MB * 1e6)
    genome = {"chr1": make_genome(rng, glen)}
    t_idx = time.time()
    idx = ReferenceIndex.build(genome, k=15, w=10)
    idx_build_mbp_s = glen / (time.time() - t_idx) / 1e6

    reads = []
    for i in range(N_READS):
        st = int(rng.integers(0, glen - READ_LEN))
        frag = genome["chr1"][st : st + READ_LEN]
        # a third of reads carry an SV (inversion or deletion) mid-read
        kind = i % 3
        if kind == 1:
            a, b = READ_LEN // 3, 2 * READ_LEN // 3
            frag = frag[:a] + revcomp(frag[a:b]) + frag[b:]
        elif kind == 2:
            a = READ_LEN // 2
            frag = frag[:a] + genome["chr1"][st + a + 3000 : st + READ_LEN + 3000]
        reads.append((f"read_{i}", mutate(rng, frag, ERR)))

    cfg = AlignerConfig(mode="H", backend="auto")
    mapper = Mapper(idx, cfg)

    # warm-up (native build, jit compile paths)
    mapper.map_read(reads[0][0], reads[0][1])

    # throughput measured with the CLI's process-parallel deployment
    import multiprocessing as mp_

    n_workers = min(4, mp_.cpu_count())
    chunks = [reads[i::n_workers] for i in range(n_workers)]
    _G.update(idx=idx, cfg=cfg, chunks=chunks)
    t0 = time.time()
    with mp_.get_context("fork").Pool(n_workers) as pool:
        results = pool.map(_map_chunk, range(n_workers))
    dt = time.time() - t0
    n_aligned = sum(sum(r) for r in results)
    total_bases = sum(len(s) for _, s in reads)
    mbp_s = total_bases / dt / 1e6

    # chain-kernel-only throughput on the same reads' anchors
    from vacmap_tpu.ops.chain_jax import chain_scores_batch, prepare_batch

    alist = []
    for name, seq in reads:
        a = idx.seeds(seq, check_num=100)
        a = a[np.argsort(a[:, 0], kind="stable")]
        alist.append(a.astype(np.int32))
    batch = prepare_batch(alist, "global", 40.0, 50)
    S, P = chain_scores_batch(batch[0], batch[1], batch[2], batch[3])
    S.block_until_ready()
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        S, P = chain_scores_batch(batch[0], batch[1], batch[2], batch[3])
        S.block_until_ready()
    chain_dt = (time.time() - t0) / reps
    chain_mbp_s = total_bases / chain_dt / 1e6

    print(
        json.dumps(
            {
                "metric": "e2e_throughput_mbp_per_s",
                "value": round(mbp_s, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(mbp_s / BASELINE_MBP_PER_S, 3),
                "n_reads": N_READS,
                "read_len": READ_LEN,
                "aligned_frac": n_aligned / N_READS,
                "chain_kernel_mbp_per_s": round(chain_mbp_s, 1),
                "index_build_mbp_per_s": round(idx_build_mbp_s, 1),
                "ms_per_read": round(dt / N_READS * 1000, 1),
                "padded_anchors": int(batch[0].shape[1]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
