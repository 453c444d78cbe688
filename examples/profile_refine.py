"""Fine-grained host profile of the refinement stage (round-3 perf work).

Maps a sample of bench-identical reads single-threaded with tracing on,
reporting refine sub-stage shares plus fill/extend job statistics
(count + size histogram + host kernel us/job) so the device-offload
design targets the measured hot spots, not guesses.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (workload generator shared with bench.py)

from vacmap_tpu import trace  # noqa: E402
from vacmap_tpu.config import AlignerConfig  # noqa: E402
from vacmap_tpu.index import ReferenceIndex  # noqa: E402
from vacmap_tpu.pipeline.mapper import Mapper  # noqa: E402

GENOME_MB = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 120


def main():
    rng = np.random.default_rng(20260816)
    glen = int(GENOME_MB * 1e6)
    gcodes = bench.make_genome_codes(rng, glen)
    idx = ReferenceIndex.build({"chr1": bench.codes_to_str(gcodes)}, k=15, w=10)

    reads = []
    for i in range(N_READS):
        st = int(rng.integers(0, glen - bench.READ_LEN - 4000))
        frag = gcodes[st : st + bench.READ_LEN].copy()
        kind = i % 3
        if kind == 1:
            a, b = bench.READ_LEN // 3, 2 * bench.READ_LEN // 3
            frag[a:b] = bench.revcomp_codes(frag[a:b])
        elif kind == 2:
            a = bench.READ_LEN // 2
            frag = np.concatenate(
                [frag[:a], gcodes[st + a + 3000 : st + bench.READ_LEN + 3000]]
            )
        reads.append(
            (f"read_{i}", bench.codes_to_str(bench.mutate_codes(rng, frag, bench.ERR)))
        )

    cfg = AlignerConfig(mode="H", backend="auto")
    mapper = Mapper(idx, cfg)
    mapper.map_read(*reads[0])  # warm

    # capture job-size stats by wrapping the two host batch aligners
    import vacmap_tpu.pipeline.extend as E

    fill_sizes, ext_sizes = [], []
    fill_t = [0.0]
    ext_t = [0.0]
    orig_gl, orig_ext = E._host_global_batch, E._host_ext_batch

    def cap_gl(pairs, eqx):
        fill_sizes.extend(max(len(t), len(q)) for t, q in pairs)
        t0 = time.perf_counter()
        r = orig_gl(pairs, eqx)
        fill_t[0] += time.perf_counter() - t0
        return r

    def cap_ext(pairs):
        ext_sizes.extend(max(len(t), len(q)) for t, q in pairs)
        t0 = time.perf_counter()
        r = orig_ext(pairs)
        ext_t[0] += time.perf_counter() - t0
        return r

    E._host_global_batch = cap_gl
    E._host_ext_batch = cap_ext

    trace.enable()
    trace.reset()
    t0 = time.time()
    for name, seq in reads:
        mapper.map_read(name, seq)
    dt = time.time() - t0
    E._host_global_batch, E._host_ext_batch = orig_gl, orig_ext

    print(trace.summary())
    fs = np.asarray(fill_sizes)
    es = np.asarray(ext_sizes)
    out = {
        "genome_mb": GENOME_MB,
        "n_reads": N_READS,
        "ms_per_read_1t": round(dt / N_READS * 1e3, 2),
        "fill_jobs_per_read": round(len(fs) / N_READS, 1),
        "fill_us_per_job": round(fill_t[0] / max(len(fs), 1) * 1e6, 1),
        "fill_ms_per_read": round(fill_t[0] / N_READS * 1e3, 2),
        "fill_size_pct": {
            p: int(np.percentile(fs, p)) for p in (50, 90, 99, 100)
        } if len(fs) else {},
        "fill_size_hist_le": {
            str(b): int((fs <= b).sum()) for b in (64, 128, 256, 512, 1024, 100000)
        } if len(fs) else {},
        "ext_jobs_per_read": round(len(es) / N_READS, 1),
        "ext_us_per_job": round(ext_t[0] / max(len(es), 1) * 1e6, 1),
        "ext_ms_per_read": round(ext_t[0] / N_READS * 1e3, 2),
        "ext_size_pct": {
            p: int(np.percentile(es, p)) for p in (50, 90, 99, 100)
        } if len(es) else {},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
