"""A/B the production fork-worker deployment: host fills vs the async
device fill service (round-3 measurement for VERDICT item 1).

Generates a bench-identical workload to FASTA/FASTQ, then runs the real
CLI twice (-t N, --device-fills off / on) and reports wall throughput.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

GENOME_MB = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
WORK = sys.argv[4] if len(sys.argv) > 4 else "/tmp/vacmap_dfbench"


def make_workload():
    os.makedirs(WORK, exist_ok=True)
    ref = f"{WORK}/ref.fa"
    fq = f"{WORK}/reads.fq"
    if os.path.exists(ref) and os.path.exists(fq):
        return ref, fq
    rng = np.random.default_rng(20260817)
    glen = int(GENOME_MB * 1e6)
    g = bench.make_genome_codes(rng, glen)
    with open(ref, "w") as f:
        f.write(">chr1\n")
        f.write(bench.codes_to_str(g))
        f.write("\n")
    with open(fq, "w") as f:
        for i in range(N_READS):
            st = int(rng.integers(0, glen - bench.READ_LEN - 4000))
            frag = g[st : st + bench.READ_LEN].copy()
            kind = i % 3
            if kind == 1:
                a, b = bench.READ_LEN // 3, 2 * bench.READ_LEN // 3
                frag[a:b] = bench.revcomp_codes(frag[a:b])
            elif kind == 2:
                a = bench.READ_LEN // 2
                frag = np.concatenate(
                    [frag[:a], g[st + a + 3000 : st + bench.READ_LEN + 3000]]
                )
            s = bench.codes_to_str(bench.mutate_codes(rng, frag, bench.ERR))
            f.write(f"@read_{i}\n{s}\n+\n{'I' * len(s)}\n")
    return ref, fq


def run(ref, fq, fills, label):
    out = f"{WORK}/out_{label}.sam"
    env = dict(os.environ)
    env.pop("VACMAP_TPU_NO_FILL_SERVER", None)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "vacmap_tpu.cli", "-ref", ref, "-read", fq,
         "-mode", "H", "-t", str(THREADS), "-o", out, "--force",
         "--device-fills", fills],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stderr[-3000:])
        raise SystemExit(f"{label} failed rc={r.returncode}")
    n = sum(1 for l in open(out) if not l.startswith("@"))
    # fill-service activation is logged by the CLI
    active = "device fill service active" in r.stderr
    return dt, n, active


def main():
    ref, fq = make_workload()
    tot_bases = N_READS * bench.READ_LEN
    res = {}
    for label, fills in (("host", "off"), ("device", "on")):
        dt, n, active = run(ref, fq, fills, label)
        res[label] = {
            "wall_s": round(dt, 1),
            "mbp_per_s": round(tot_bases / dt / 1e6, 3),
            "records": n,
            "fill_service_active": active,
        }
        print(json.dumps({label: res[label]}), flush=True)
    if "device" in res and "host" in res:
        res["device_vs_host"] = round(
            res["device"]["mbp_per_s"] / res["host"]["mbp_per_s"], 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
