"""A/B the production fork-worker deployment: host fills vs the async
device fill service (round-3 measurement for VERDICT item 1).

Generates a bench-identical workload to FASTA/FASTQ, prebuilds the
index (so neither timed run pays it), then runs the real CLI twice
(-t N, --device-fills off / on) and reports wall throughput.  Device
activation is verified through the service stats file, not log grep.
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
    tag = f"{GENOME_MB}_{N_READS}"
    ref = f"{WORK}/ref_{tag}.fa"
    fq = f"{WORK}/reads_{tag}.fq"
    vmi = f"{WORK}/ref_{tag}.vmi"
    if not (os.path.exists(ref) and os.path.exists(fq)):
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
    if not os.path.exists(os.path.join(vmi, "meta.json")):
        subprocess.run(
            [sys.executable, "-m", "vacmap_tpu.index", ref, vmi],
            check=True, timeout=1800,
        )
    return vmi, fq


def run(ref, fq, fills, label):
    out = f"{WORK}/out_{label}.sam"
    stats = f"{WORK}/fill_stats_{label}.txt"
    env = dict(os.environ)
    env.pop("VACMAP_TPU_NO_FILL_SERVER", None)
    env["VACMAP_TPU_FILL_STATS"] = stats
    if os.path.exists(stats):
        os.remove(stats)
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
    st = open(stats).read().strip() if os.path.exists(stats) else ""
    return dt, n, st


def main():
    ref, fq = make_workload()
    tot_bases = N_READS * bench.READ_LEN
    res = {}
    for label, fills in (("host", "off"), ("device", "on")):
        dt, n, st = run(ref, fq, fills, label)
        res[label] = {
            "wall_s": round(dt, 1),
            "mbp_per_s": round(tot_bases / dt / 1e6, 3),
            "records": n,
            "fill_stats": st,
        }
        print(json.dumps({label: res[label]}), flush=True)
    if "device" in res and "host" in res:
        res["device_vs_host"] = round(
            res["device"]["mbp_per_s"] / res["host"]["mbp_per_s"], 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
