"""CLI end-to-end tests: argument handling, single/multi-process runs,
output formats, mode dispatch."""

import gzip
import os

import numpy as np
import pytest

from vacmap_tpu.cli import main
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def cli_world(rng, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genome = random_dna(rng, 60_000)
    ref = d / "ref.fa"
    ref.write_text(f">c1\n{genome}\n")
    reads = d / "reads.fq.gz"
    with gzip.open(reads, "wt") as f:
        for i in range(3):
            st = 5_000 + i * 10_000
            frag = genome[st : st + 4000]
            f.write(f"@rd{i}\n{frag}\n+\n{'I' * len(frag)}\n")
    return d, ref, reads, genome


def run_cli(args):
    return main([str(a) for a in args])


def test_cli_sam_single_thread(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "out1.sam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "1",
                  "-o", out, "--force"])
    assert rc == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 3
    assert all(l.split("\t")[2] == "c1" for l in lines)
    # quals preserved
    assert set(lines[0].split("\t")[10]) == {"I"}
    # index file was written and is reusable
    assert any(".vmi" in f for f in os.listdir(d))


def test_cli_multiprocess_bam(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "out2.bam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "2",
                  "-o", out, "--force"])
    assert rc == 0
    from vacmap_tpu.io.bam_reader import read_bam

    recs = list(read_bam(str(out)))
    assert len(recs) == 3


def test_cli_sorted_bam(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "out3.sorted.bam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "L", "-t", "1",
                  "-o", out, "--force"])
    assert rc == 0
    import struct, zlib

    data = gzip.open(out, "rb").read()
    assert data[:4] == b"BAM\x01"


def test_cli_asm_mode(cli_world, tmp_path):
    d, ref, reads, genome = cli_world
    contig = tmp_path / "asm.fa"
    contig.write_text(f">ctg1\n{genome[10_000:40_000]}\n")
    out = tmp_path / "asm.sam"
    rc = run_cli(["-ref", ref, "-read", contig, "-mode", "asm",
                  "-workdir", tmp_path / "wd", "-o", out, "--force"])
    assert rc == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) >= 1
    f = lines[0].split("\t")
    assert abs(int(f[3]) - 10_001) < 100
    assert "=" in f[5]  # asm forces eqx


def test_cli_mode_R_and_S(cli_world):
    d, ref, reads, genome = cli_world
    for mode in ("R", "S"):
        out = d / f"out_{mode}.sam"
        rc = run_cli(["-ref", ref, "-read", reads, "-mode", mode, "-t", "1",
                      "-o", out, "--force"])
        assert rc == 0
        lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
        assert len(lines) == 3


def test_cli_rejects_existing_output(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "exists.sam"
    out.write_text("x")
    with pytest.raises(ValueError):
        run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-o", out])


def test_cli_wildcard_reads(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "wild.sam"
    rc = run_cli(["-ref", ref, "-read", str(d / "*.fq.gz"), "-mode", "H",
                  "-t", "1", "-o", out, "--force"])
    assert rc == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 3


def test_cli_executor_backend(cli_world):
    d, ref, reads, genome = cli_world
    out = d / "out_exec.sam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "2",
                  "--backend", "jax", "--batch-reads", "2", "-o", out,
                  "--force"])
    assert rc == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 3


def test_prebuilt_directory_vmi_ref(tmp_path, cli_world):
    """Standalone pre-build (python -m vacmap_tpu.index) writes a
    directory .vmi (external-sort builder); passing that directory as
    -ref must produce the same alignments as building from FASTA."""
    from vacmap_tpu.index.__main__ import main as index_main
    import sys

    d, ref, reads, genome = cli_world
    vmi = str(tmp_path / "pre.vmi")
    old = sys.argv
    try:
        sys.argv = ["index", str(ref), vmi]
        assert index_main() == 0
    finally:
        sys.argv = old
    out = tmp_path / "o.sam"
    rc = run_cli(["-ref", vmi, "-read", reads, "-mode", "H", "-t", "1",
                  "-o", out, "--force"])
    assert rc == 0
    body = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(body) == 3


def test_cli_dedup_by_name_all_branches(cli_world, tmp_path):
    """Duplicate read names are dropped in EVERY execution branch, like the
    reference main loop (vacmap:430-517) — not just the multiprocess one."""
    d, ref, reads, genome = cli_world
    dup = tmp_path / "dup.fa"
    frag = genome[5_000:9_000]
    dup.write_text(f">same\n{frag}\n>same\n{frag}\n>other\n{genome[20_000:24_000]}\n")
    for t, suffix in (("1", "a"), ("2", "b")):
        out = tmp_path / f"dedup_{suffix}.sam"
        rc = run_cli(["-ref", ref, "-read", dup, "-mode", "H", "-t", t,
                      "-o", out, "--force", "--nowriteindex"])
        assert rc == 0
        names = [l.split("\t")[0] for l in out.read_text().splitlines()
                 if not l.startswith("@")]
        assert names.count("same") == 1, f"-t {t}: {names}"
        assert names.count("other") == 1


def test_cli_asm_refuses_existing_workdir(cli_world, tmp_path):
    """A pre-existing -workdir is refused (mammap_asm.py:23208-23210), and
    a fresh one is removed after the run."""
    d, ref, reads, genome = cli_world
    contig = tmp_path / "contig.fa"
    contig.write_text(f">ctg\n{genome[2_000:42_000]}\n")
    wd = tmp_path / "wd"
    wd.mkdir()
    (wd / "precious.txt").write_text("do not delete")
    out = tmp_path / "asm.sam"
    rc = run_cli(["-ref", ref, "-read", contig, "-mode", "asm", "-t", "1",
                  "-o", out, "--force", "--nowriteindex", "-workdir", wd])
    assert rc == 1
    assert (wd / "precious.txt").exists()
    wd2 = tmp_path / "wd2"
    rc = run_cli(["-ref", ref, "-read", contig, "-mode", "asm", "-t", "1",
                  "-o", out, "--force", "--nowriteindex", "-workdir", wd2])
    assert rc == 0
    assert not wd2.exists()


def test_cli_multihost_read_sharding(cli_world, tmp_path):
    """Two processes of a multi-host run (--num-processes 2) partition the
    deduplicated reads round-robin into per-process part outputs whose
    union equals the single-process output (VERDICT.md next-step 4;
    reference counterpart: queue-pull DP, vacmap:390-420)."""
    d, ref, reads, genome = cli_world
    many = tmp_path / "many.fa"
    with open(many, "w") as f:
        for i in range(6):
            st = 3_000 + i * 8_000
            f.write(f">m{i}\n{genome[st : st + 4_000]}\n")
        f.write(f">m0\n{genome[3_000:7_000]}\n")  # duplicate name: dropped
    single = tmp_path / "single.sam"
    rc = run_cli(["-ref", ref, "-read", many, "-mode", "H", "-t", "1",
                  "-o", single, "--force", "--nowriteindex"])
    assert rc == 0
    names_single = {l.split("\t")[0] for l in single.read_text().splitlines()
                    if not l.startswith("@")}
    assert names_single == {f"m{i}" for i in range(6)}

    # process 1 first (its part survives until process 0 merges)
    out = tmp_path / "mh.sam"
    rc = run_cli(["-ref", ref, "-read", many, "-mode", "H", "-t", "1",
                  "-o", out, "--force", "--nowriteindex",
                  "--num-processes", "2", "--process-id", "1"])
    assert rc == 0
    part1 = tmp_path / "mh.part1.sam"
    assert part1.exists()
    got1 = {l.split("\t")[0] for l in part1.read_text().splitlines()
            if not l.startswith("@")}
    assert got1 == {"m1", "m3", "m5"}
    rc = run_cli(["-ref", ref, "-read", many, "-mode", "H", "-t", "1",
                  "-o", out, "--force", "--nowriteindex",
                  "--num-processes", "2", "--process-id", "0"])
    assert rc == 0
    # process 0 merged both parts into the single reference-style output
    merged = {l.split("\t")[0] for l in out.read_text().splitlines()
              if not l.startswith("@")}
    assert merged == names_single
    assert not part1.exists()


def test_cli_device_fills_fork_matches_host(cli_world, monkeypatch):
    """The fork-worker deployment with the async fill server produces
    byte-identical SAM to the host-only path (host-emulation aligner
    stands in for the Pallas kernel on CPU)."""
    d, ref, reads, genome = cli_world
    host_out = d / "df_host.sam"
    dev_out = d / "df_dev.sam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "2",
                  "-o", host_out, "--force", "--device-fills", "off"])
    assert rc == 0
    monkeypatch.delenv("VACMAP_TPU_NO_FILL_SERVER", raising=False)
    monkeypatch.setenv("VACMAP_TPU_FILL_HOST", "1")
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "2",
                  "-o", dev_out, "--force", "--device-fills", "on"])
    assert rc == 0

    def body(p):
        return sorted(
            l for l in p.read_text().splitlines() if not l.startswith("@")
        )

    assert body(dev_out) == body(host_out)
    assert len(body(dev_out)) == 3


def test_cli_multiprocess_sam_single_header(cli_world):
    """SAM through the writer process must carry exactly one header: the
    writer used to be constructed pre-fork, leaving the header text in a
    buffered handle that every forked process flushed at exit."""
    d, ref, reads, genome = cli_world
    out = d / "hdr.sam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "2",
                  "-o", out, "--force"])
    assert rc == 0
    text = open(out).read().splitlines()
    assert sum(1 for l in text if l.startswith("@HD")) == 1
    assert sum(1 for l in text if l.startswith("@PG")) == 1


@pytest.mark.parametrize("ext", ["sam", "bam", "sorted.bam"])
def test_cli_multihost_merged_output(cli_world, ext):
    """Multi-host runs produce ONE merged output like the reference:
    each process writes <out>.partI + a .done sentinel; process 0 waits
    and merges (SAM header-dedup / BAM raw-record restream / sorted-BAM
    coordinate heap-merge)."""
    d, ref, reads, genome = cli_world
    out = d / f"mh.{ext}"
    # process 1 first so process 0's merge wait is satisfied immediately
    for pid in (1, 0):
        rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "1",
                      "-o", out, "--force", "--num-processes", "2",
                      "--process-id", pid])
        assert rc == 0
    assert os.path.exists(out)
    assert not any(".part" in f for f in os.listdir(d))
    if ext == "sam":
        lines = [l for l in open(out).read().splitlines()]
        assert sum(1 for l in lines if l.startswith("@HD")) == 1
        recs = [l for l in lines if not l.startswith("@")]
        assert len(recs) == 3
    else:
        from vacmap_tpu.io.bam_reader import read_bam

        recs = list(read_bam(str(out)))
        assert len(recs) == 3
        if ext == "sorted.bam":
            from vacmap_tpu.io.merge_parts import raw_bam_records

            poss = [(rid, pos) for rid, pos, _ in raw_bam_records(str(out))]
            assert poss == sorted(poss)
    names = sorted(r.split("\t")[0] if ext == "sam" else r[0] for r in recs)
    assert names == ["rd0", "rd1", "rd2"]


def test_cli_multihost_file_sharding(cli_world, tmp_path):
    """With >= num-processes input files, whole files shard across
    processes (1/N input I/O per host) and the merged output still
    covers every read exactly once."""
    d, ref, reads, genome = cli_world
    files = []
    for j in range(2):
        f = tmp_path / f"in{j}.fa"
        with open(f, "w") as fh:
            for i in range(2):
                st = 4_000 + (2 * j + i) * 9_000
                fh.write(f">f{j}_{i}\n{genome[st : st + 4_000]}\n")
        files.append(f)
    out = tmp_path / "fs.sam"
    for pid in (1, 0):
        rc = run_cli(["-ref", ref, "-read", files[0], files[1], "-mode", "H",
                      "-t", "1", "-o", out, "--force", "--nowriteindex",
                      "--num-processes", "2", "--process-id", str(pid)])
        assert rc == 0
    names = sorted(l.split("\t")[0] for l in out.read_text().splitlines()
                   if not l.startswith("@"))
    assert names == ["f0_0", "f0_1", "f1_0", "f1_1"]


def test_cli_multihost_jax_distributed_boot(cli_world, tmp_path):
    """Round-5 item 7: two REAL processes boot jax.distributed on CPU
    via --coordinator, pass the cross-process device barrier
    (parallel/mesh.initialize_distributed), map the corpus, and the
    merged output's records are byte-identical to a single-process run
    (headers differ only in the @PG command line)."""
    import socket
    import subprocess
    import sys as _sys

    d, ref, reads, genome = cli_world
    # single-process reference output
    solo = d / "solo.sam"
    rc = run_cli(["-ref", ref, "-read", reads, "-mode", "H", "-t", "1",
                  "-o", solo, "--force"])
    assert rc == 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = tmp_path / "dist.sam"
    env = dict(os.environ)
    env["VACMAP_TPU_PLATFORM"] = "cpu"
    env["VACMAP_TPU_NO_FILL_SERVER"] = "1"
    procs = [
        subprocess.Popen(
            [_sys.executable, "-m", "vacmap_tpu.cli", "-ref", str(ref),
             "-read", str(reads), "-mode", "H", "-t", "1", "-o", str(out),
             "--force", "--nowriteindex",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    body = [ln for ln in out.read_text().splitlines()
            if not ln.startswith("@")]
    want = [ln for ln in solo.read_text().splitlines()
            if not ln.startswith("@")]
    assert sorted(body) == sorted(want) and len(body) == 3
    hdr = [ln.split("\t")[0] for ln in out.read_text().splitlines()
           if ln.startswith("@")]
    assert hdr.count("@HD") == 1 and hdr.count("@PG") == 1
