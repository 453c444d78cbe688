"""Full-size seeding-deviation measurement (VERDICT round-2 item 3).

Runs the machinery of tests/test_seeding_deviation.py at >=500 reads
across modes and prints the record-level agreement rate plus a
breakdown of residual divergences.

    python examples/measure_seeding_deviation.py [n_reads]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from tests.test_seeding_deviation import make_world, run_pair, sample_reads


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    per_batch = 50
    results = {}
    for mode, seed0 in (("H", 500), ("L", 600)):
        n_all = agree_all = 0
        divs = []
        seed = seed0
        while n_all < n_total:
            genome, alt, rng = make_world(seed)
            reads = sample_reads(rng, alt, per_batch)
            n, agree, div = run_pair(mode, genome, reads)
            n_all += n
            agree_all += agree
            divs.extend(div)
            seed += 1
            print(f"{mode}: {agree_all}/{n_all} agree "
                  f"({agree_all / n_all:.4f})", flush=True)
        results[mode] = (n_all, agree_all, divs)

    for mode, (n, agree, divs) in results.items():
        print(f"\n=== mode {mode}: {agree}/{n} = {agree / n:.4f} ===")
        for rid, ka, kb in divs[:10]:
            print(f"  {rid}: ours={len(ka)} recs, ref={len(kb)} recs")
            for a, b in zip(ka, kb):
                if a != b:
                    print(f"    ours {a[:5]} cig[{a[5][:40]}]")
                    print(f"    ref  {b[:5]} cig[{b[5][:40]}]")
                    break


if __name__ == "__main__":
    main()
