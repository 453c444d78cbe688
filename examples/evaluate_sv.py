"""End-to-end SV benchmark: simulate SVs with vacsim, sequence noisy
reads from the altered genome, map them with vacmap-tpu, call simple SV
signatures from the alignments, and score recall against the truth VCF.

    python examples/evaluate_sv.py [--genome-kb 400] [--n-sv 8]
                                   [--coverage 6] [--err 0.06]

This mirrors the reference's validation recipe (vacsim + external
benchmarking, SURVEY.md section 4) in one self-contained script.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vacmap_tpu.config import AlignerConfig
from vacmap_tpu.index import ReferenceIndex
from vacmap_tpu.pipeline.mapper import Mapper
from vacmap_tpu.seq import revcomp
from vacmap_tpu.sim.svcalls import call_signatures
from vacmap_tpu.sim.vacsim import simulate


def make_genome(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


def mutate(rng, s, err):
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.4:
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err * 0.7:
            out.append(ch)
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < err:
            pass
        else:
            out.append(ch)
    return "".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-kb", type=int, default=400)
    ap.add_argument("--n-sv", type=int, default=8)
    ap.add_argument("--coverage", type=int, default=6)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--err", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    genome = {"chrS": make_genome(rng, args.genome_kb * 1000)}
    params = (
        f"Specified{{DEL:400:800;number={args.n_sv // 2}}}\n"
        f"Specified{{INV:1000:2000;number={args.n_sv - args.n_sv // 2}}}\n"
    )
    altered, truth = simulate(params, genome, heterozygous_ratio=0.0,
                              seed=args.seed)
    print(f"simulated {len(truth)} SV events")

    idx = ReferenceIndex.build(genome, k=15, w=10)
    mapper = Mapper(idx, AlignerConfig(mode="H"))

    alt = altered["chrS"]
    n_reads = max(1, args.coverage * len(alt) // args.read_len)
    t0 = time.time()
    all_calls = []
    for i in range(n_reads):
        st = int(rng.integers(0, max(1, len(alt) - args.read_len)))
        read = mutate(rng, alt[st : st + args.read_len], args.err)
        if rng.random() < 0.5:
            read = revcomp(read)
        recs, _ = mapper.map_read_records(f"sim{i}", read)
        all_calls.extend(call_signatures(recs))
    dt = time.time() - t0
    print(f"mapped {n_reads} reads in {dt:.1f}s "
          f"({n_reads * args.read_len / dt / 1e6:.2f} Mbp/s single-thread)")

    found = 0
    for ev in truth:
        kind, contig, st = ev[0], ev[1], ev[2]
        hits = [
            c for c in all_calls
            if c[0] == kind and c[1] == contig and abs(c[2] - st) < 250
        ]
        mark = "+" if hits else "-"
        print(f"  {mark} {kind} @ {st} ({len(hits)} supporting reads)")
        found += bool(hits)
    print(f"SV recall: {found}/{len(truth)}")
    return 0 if found >= 0.8 * len(truth) else 1


if __name__ == "__main__":
    sys.exit(main())
