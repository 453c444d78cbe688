"""On-hardware decision for the banded score-only Myers redesign
(round-5 item 9; VERDICT round-4 weak 8).

The full-width Pallas Myers (examples/myers_pallas_device.py) measured a 7.8x e2e
LOSS as a divergence-filter offload (round-3).  The proposed redesign
keeps a compact sliding band of ceil(band/32) words instead of
ceil(m/32) — per-step vector cost scales with 128-lane register ROWS,
so its best case is bounded by the row ratio.  This script measures the
existing kernel's per-row per-step cost slope across its bucket ladder
on hardware and projects the banded kernel's floor (band = the host
ladder's first rung, max(256, mn/16) — decisions at that band settle
~95% of spans, round-3b).  The same 2x rule that deleted the Pallas
chain kernel applies: if the PROJECTED banded floor still loses to the
host adaptive cap ladder by >2x per job, the redesign cannot win and
the module moves to examples/.

Run on the TPU host:  python examples/measure_myers_banded_projection.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from vacmap_tpu import native
    from myers_pallas_device import PallasMyersAligner
    from vacmap_tpu.parallel import runtime

    runtime.enable_compilation_cache()
    rng = np.random.default_rng(5)

    def job(n):
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = t.copy()
        mm = rng.random(n) < 0.06
        q[mm] = rng.integers(0, 4, int(mm.sum())).astype(np.uint8)
        return t, q

    pa = PallasMyersAligner()
    rows = []
    for (T, Wd) in pa.buckets:
        B = pa.shape_b[T]
        jobs = [job(T - 8) for _ in range(B)]
        pa.distance_batch(jobs)  # warm/compile
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            d_dev = pa.distance_batch(jobs)
            best = min(best, time.time() - t0)
        # host adaptive ladder on the same jobs
        t0 = time.time()
        d_host = [native.edit_distance_native(t, q) for t, q in jobs]
        host_s = time.time() - t0
        assert d_dev == d_host, "device distances must be exact"
        n_rows = (Wd + 127) // 128
        per_job = best / B
        rows.append((T, Wd, n_rows, per_job, host_s / B))
        print(f"bucket T={T} Wd={Wd} rows={n_rows}: device "
              f"{per_job * 1e3:.2f} ms/job, host ladder "
              f"{host_s / B * 1e3:.3f} ms/job, exact={d_dev == d_host}")

    # per-row per-step slope from the ladder (device cost ~ T * rows)
    xs = np.array([[t * r] for t, _, r, _, _ in rows])
    ys = np.array([p for *_, p, _ in rows])
    slope = float(np.linalg.lstsq(xs, ys, rcond=None)[0][0])
    print(f"fitted per-(row*step) cost: {slope * 1e9:.2f} ns")
    print("\nbanded-kernel floor projection (band = max(256, mn/16)):")
    for mn in (2048, 8192, 20480):
        band = max(256, mn // 16)
        b_rows = (band // 32 + 127) // 128
        floor = slope * mn * b_rows
        host = [h for t, _, r, p, h in rows if t == mn][0]
        print(f"  span {mn}: projected {floor * 1e3:.3f} ms/job vs "
              f"host-EXACT {host * 1e3:.3f} ms/job -> {floor / host:.1f}x")

    # ---- the PRODUCTION comparison: real pipeline spans, real host
    # ladder policy (divergence_exceeds' adaptive caps) -----------------
    from vacmap_tpu.config import AlignerConfig
    from vacmap_tpu.index import ReferenceIndex
    from vacmap_tpu.ops import edit as edit_mod
    from vacmap_tpu.pipeline.mapper import Mapper

    bases = np.frombuffer(b"ACGT", np.uint8)
    glen = 20_000_000
    g = rng.integers(0, 4, glen, dtype=np.uint8)
    idx = ReferenceIndex.build({"chrM": bases[g].tobytes().decode()},
                               k=15, w=10)
    spans = []
    orig = edit_mod.divergence_exceeds

    def cap_probe(a, b, r):
        spans.append((np.asarray(a), np.asarray(b), r))
        return orig(a, b, r)

    import vacmap_tpu.pipeline.extend as E
    for nm in ("divergence_exceeds",):
        if hasattr(E, nm):
            setattr(E, nm, cap_probe)
    edit_mod.divergence_exceeds = cap_probe
    m = Mapper(idx, AlignerConfig(mode="H"))
    for i in range(24):
        st = int(rng.integers(0, glen - 21_000))
        frag = g[st : st + 20_000].copy()
        frag[7000:13000] = (3 - frag[7000:13000])[::-1]
        mut = frag.copy()
        mm = rng.random(len(mut)) < 0.05
        mut[mm] = rng.integers(0, 4, int(mm.sum())).astype(np.uint8)
        m.map_read(f"d{i}", bases[mut].tobytes().decode())
    edit_mod.divergence_exceeds = orig
    if hasattr(E, "divergence_exceeds"):
        E.divergence_exceeds = orig
    print(f"\ncaptured {len(spans)} real divergence spans "
          f"(median mn {int(np.median([min(len(a), len(b)) for a, b, _ in spans]))})")
    t0 = time.time()
    for a, b, r in spans:
        orig(a, b, r)
    host_ladder_ms = (time.time() - t0) / max(len(spans), 1) * 1e3
    # device: exact distances via the existing kernel answer the same
    # decision; banded floor applies the row-ratio to each span
    pairs = [(a, b) for a, b, _ in spans]
    pa.distance_batch(pairs)  # warm remaining shapes
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        pa.distance_batch(pairs)
        best = min(best, time.time() - t0)
    dev_ms = best / max(len(spans), 1) * 1e3
    floor_ms = np.mean([
        slope * min(len(a), len(b))
        * ((max(256, min(len(a), len(b)) // 16) // 32 + 127) // 128)
        for a, b in pairs
    ]) * 1e3
    print(f"host production ladder: {host_ladder_ms:.3f} ms/span")
    print(f"device full-width (existing kernel, incl transfers): "
          f"{dev_ms:.3f} ms/span -> {dev_ms / host_ladder_ms:.1f}x host")
    print(f"device banded FLOOR (projected, compute only): "
          f"{floor_ms:.3f} ms/span -> {floor_ms / host_ladder_ms:.1f}x host")
    verdict = ("REDESIGN CANNOT WIN (>2x rule) -> move to examples/"
               if floor_ms > 2 * host_ladder_ms else
               "banded redesign is within 2x -> implement it")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
