"""vacmap-tpu command line interface.

Flag parity with the reference CLI (``src/vacmap/vacmap:75-152``), with a
few TPU-era additions (--backend, --batch-reads).  The reference index is
our own ``.vmi`` format (no external minimap2 needed).
"""

from __future__ import annotations

import argparse
import dataclasses
import glob as globmod
from hashlib import blake2b as _blake2b
import logging
import multiprocessing as mp
import os
import sys
import time
from typing import List, Optional

from .config import AlignerConfig
from .index.index import ReferenceIndex
from .io.fastx import fastx_read
from .io.sam_writer import OutputWriter
from .pipeline.mapper import Mapper

log = logging.getLogger("vacmap_tpu")

RG_TAGS = ["id", "sm", "lb", "pl", "ds", "dt", "pu", "pi", "pg", "cn", "fo", "ks", "pm", "bc"]


def _prewarm() -> int:
    """Populate the persistent XLA/Mosaic compile cache for every shipped
    device-fill bucket shape, so a cache-cold production run doesn't pay
    the multi-minute Mosaic compile at startup (VERDICT item 10).  Safe
    without an accelerator: the probe fails fast and we exit non-zero."""
    from .parallel.fill_service import start_fill_server

    if not _probe_accelerator():
        log.error("--prewarm: no accelerator answered the probe")
        return 1
    t0 = time.time()
    handle = start_fill_server(1, wait_ready=True, ready_timeout=3600)
    ok = handle is not None
    if handle is not None:
        handle.stop()
    log.info("prewarm %s in %.1fs (cache: ~/.cache/vacmap_tpu_xla)",
             "complete" if ok else "FAILED", time.time() - t0)
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vacmap-tpu",
        description="vacmap-tpu — TPU-native long-read aligner for structural "
        "variation discovery",
        formatter_class=argparse.RawTextHelpFormatter,
    )
    req = p.add_argument_group("Required Arguments")
    req.add_argument("-ref", required=True, help="Reference FASTA or .vmi index")
    req.add_argument("-read", required=True, nargs="+", action="append",
                     help="Read file(s); wildcards supported")
    req.add_argument("-mode", required=True, choices=["H", "L", "S", "R", "asm"],
                     help="H: noisy long reads (ONT/CLR)\nL: HiFi\nS: sensitive\n"
                          "R: no-prefer-closer\nasm: assembly")
    out = p.add_argument_group("Output Arguments")
    out.add_argument("-o", default="-", help="Output (- | .sam | .bam | .sorted.bam)")
    out.add_argument("--force", action="store_true")
    out.add_argument("--nowriteindex", action="store_true")
    out.add_argument("--lowmem", action="store_true",
                     help="force the bounded-memory external-sort index "
                          "builder (auto for references >= 1 Gb)")
    out.add_argument("--prewarm", action="store_true",
                     help="compile-cache prewarm: populate the persistent "
                          "XLA/Mosaic cache for all device-fill bucket "
                          "shapes, then exit (no -ref/-read needed)")
    par = p.add_argument_group("Alignment Parameters")
    par.add_argument("-t", type=int, default=4, help="Threads (default 4)")
    par.add_argument("-k", type=int, default=15)
    par.add_argument("-w", type=int, default=10)
    par.add_argument("-c", type=int, default=100, help="Top N clusters")
    par.add_argument("-maxdivergence", type=float)
    pen = p.add_argument_group("Penalties")
    pen.add_argument("-globalpenalty", type=float)
    pen.add_argument("-localpenalty", type=float)
    pen.add_argument("-globalmaxdiff", type=int, default=50)
    pen.add_argument("-localmaxdiff", type=int, default=30)
    fl = p.add_argument_group("Flags")
    fl.add_argument("--eqx", action="store_true")
    fl.add_argument("--MD", action="store_true")
    fl.add_argument("--cs", nargs="?", const="short", default=None)
    fl.add_argument("--L", action="store_true", dest="cigar2cg")
    fl.add_argument("--markunbalancetra", action="store_true", default=None)
    fl.add_argument("--nodiscard", action="store_true", default=None)
    fl.add_argument("--copycomments", action="store_true")
    fl.add_argument("--H", action="store_true", dest="hardclip")
    fl.add_argument("--fakecigar", action="store_true")
    fl.add_argument("--Q", action="store_true", dest="ignore_quals")
    fl.add_argument("--debug", action="store_true")
    fl.add_argument("-workdir", help="Working directory (asm mode)")
    fl.add_argument("--backend", choices=["auto", "jax", "numpy"], default="auto",
                    help="Compute backend for the hot kernels")
    fl.add_argument("--batch-reads", type=int, default=64)
    fl.add_argument("--device-fills", nargs="?", const="on",
                    choices=["auto", "on", "off"], default="auto",
                    help="run base-level CIGAR fills on the TPU (async "
                         "pipelined Pallas fill service). auto (default): "
                         "on when an accelerator is present; off: host "
                         "C++ kernels only")
    mh = p.add_argument_group("Multi-host (jax.distributed)")
    mh.add_argument("--coordinator", help="host:port of process 0")
    mh.add_argument("--num-processes", type=int)
    mh.add_argument("--process-id", type=int)
    rg = p.add_argument_group("Read-group (RG) metadata")
    for tag in RG_TAGS:
        rg.add_argument(f"--rg-{tag}", dest=f"rg_{tag}")
    return p


def config_from_args(args) -> AlignerConfig:
    rg_extra = {t: getattr(args, f"rg_{t}") for t in RG_TAGS if getattr(args, f"rg_{t}", None)}
    if rg_extra and "id" not in rg_extra:
        raise ValueError("--rg-id is required when any other --rg-* option is supplied")
    return AlignerConfig(
        mode=args.mode,
        kmersize=args.k,
        window=args.w,
        check_num=args.c,
        global_maxdiff=args.globalmaxdiff,
        local_maxdiff=args.localmaxdiff,
        global_skipcost=args.globalpenalty,
        local_skipcost=args.localpenalty,
        max_divergence=args.maxdivergence,
        markunbalancetra=args.markunbalancetra,
        nodiscard=args.nodiscard,
        eqx=args.eqx,
        md=args.MD,
        cs=args.cs is not None,
        shortcs=args.cs != "long",
        cigar2cg=args.cigar2cg,
        hardclip=args.hardclip,
        fakecigar=args.fakecigar,
        copycomments=args.copycomments,
        ignore_quals=args.ignore_quals,
        rg_id=rg_extra.get("id", "1") if (rg_extra or True) else None,
        threads=args.t,
        batch_reads=args.batch_reads,
        backend=args.backend,
        debug=args.debug,
        workdir=args.workdir,
    )


def expand_read_paths(read_args) -> List[str]:
    raw = [x for sub in read_args for x in sub]
    out = []
    for s in raw:
        if any(ch in s for ch in "*?[]"):
            hits = globmod.glob(s)
            out.extend(hits if hits else [s])
        else:
            out.append(s)
    return out


def load_or_build_index(refpath: str, k: int, w: int, write_index: bool,
                        lowmem: bool = False) -> ReferenceIndex:
    if refpath.endswith(".vmi.npz") or refpath.endswith(".vmi"):
        try:
            return ReferenceIndex.load(refpath,
                                       in_ram=False if lowmem else None)
        except (FileNotFoundError, ValueError) as e:
            raise SystemExit(f"ERROR: not a valid .vmi index: {refpath} ({e})")
    index_name = f"{refpath}.w{w}_k{k}.vmi"
    if os.path.isdir(index_name) or os.path.isfile(index_name + ".npz"):
        log.info("Loading index %s", index_name)
        return ReferenceIndex.load(
            index_name if os.path.isdir(index_name) else index_name + ".npz",
            in_ram=False if lowmem else None,
        )
    log.info("Building index for %s (k=%d w=%d)", refpath, k, w)
    # genome-scale references: stream contigs through the external-sort
    # builder straight into the .vmi directory — the genome is never held
    # in Python strings and peak RSS stays bounded by the sketch chunk.
    # Heuristic: on-disk FASTA size (gz assumed ~4x compressed).
    fsize = os.path.getsize(refpath)
    approx = fsize * 4 if refpath.endswith(".gz") else fsize
    # in-RAM native build peak is ~8 B/bp (strings + codes + int64 table
    # temporaries); take the external bounded-memory builder only when
    # that wouldn't comfortably fit, or on explicit --lowmem
    try:
        avail = (os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE"))
    except (ValueError, OSError):
        avail = 0
    fits_ram = approx * 8 < avail // 2
    if write_index and (lowmem or (approx >= (1 << 30) and not fits_ram)):
        idx = ReferenceIndex.build_external(
            ((r[0], r[1]) for r in fastx_read(refpath)), index_name, k=k, w=w
        )
        log.info("Saved index to %s (external build)", index_name)
        return idx
    contigs = {}
    for rec in fastx_read(refpath):
        contigs[rec[0]] = rec[1]
    idx = ReferenceIndex.build(contigs, k=k, w=w)
    if write_index:
        idx.save(index_name)
        log.info("Saved index to %s", index_name)
    return idx


def _read_records(path: str, cfg):
    """Dispatch FASTX vs BAM input (the reference reads BAM via pysam,
    vacmap:439-471; ours is the native io.bam_reader)."""
    if path.endswith(".bam"):
        from .io.bam_reader import read_bam

        yield from read_bam(path)
    else:
        yield from fastx_read(path, read_comment=cfg.copycomments)


def _probe_accelerator(timeout: float = 120.0) -> bool:
    """True when an accelerator answers a trivial computation in time.
    Runs in a subprocess: a dead compile relay hangs jax backend init
    uninterruptibly, and the CLI must degrade to the host deployment
    instead of freezing (a dead relay blocks jax init in C land)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((64, 64)); (x @ x).block_until_ready()")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        # ANY responsive backend passes (a CPU-only host running
        # --backend jax is an explicit user choice; the probe only
        # guards against the relay hang)
        return r.returncode == 0
    except Exception:
        return False


def _dedup_records(paths, cfg, shard=(0, 1)):
    """Records across all read files, de-duplicated by name hash exactly
    like the reference main loop (vacmap:430-517) — shared by every
    execution branch (single-worker, multiprocess, and batched executor).

    ``shard = (process_id, num_processes)``: in a multi-host run every
    process reads the same inputs; de-duplication happens first (it is
    input-order deterministic, so consistent across processes) and the
    surviving records round-robin over processes — the multi-host analog
    of the reference's queue-pull data parallelism (vacmap:390-420)."""
    pid, n_proc = shard
    if n_proc > 1 and len(paths) >= n_proc:
        # enough input files: shard whole FILES so each host parses only
        # ~1/N of the input bytes (a multi-host run over the reference's
        # own 170 GB workload otherwise parses everything N times).
        # Dedup is per-process here; duplicate read names split across
        # different hosts' files are not cross-deduplicated (the
        # round-robin path below keeps the reference's global-dedup
        # semantics when that matters).
        mine = paths[pid::n_proc]
        log.info("process %d/%d reads %d/%d input files", pid, n_proc,
                 len(mine), len(paths))
        paths, pid, n_proc = mine, 0, 1
    seen = set()
    i = 0
    for path in paths:
        log.info("Reading %s", path)
        for rec in _read_records(path, cfg):
            # process-stable 64-bit hash: builtin hash() is randomized per
            # process (PYTHONHASHSEED), so a collision would be process-
            # specific and silently desynchronize the multi-host
            # round-robin counter — blake2b keys identically everywhere
            h = _blake2b(rec[0].encode(), digest_size=8).digest()
            if h in seen:
                continue
            seen.add(h)
            take = (i % n_proc) == pid
            i += 1
            if take:
                yield rec


def _worker_loop(raw_q, cooked_q, mapper, cfg, use_async: bool):
    """One mapping thread: pulls reads, emits SAM line batches."""
    from collections import deque

    map_fn = mapper.map_contig if cfg.mode == "asm" else mapper.map_read
    batch: List[str] = []
    chars = 0

    def emit(lines):
        nonlocal batch, chars
        for l in lines:
            chars += len(l)
        batch.extend(lines)
        if chars > 2_000_000:
            cooked_q.put(batch)
            batch, chars = [], 0

    # async deployment: keep a window of reads whose device fill batches
    # are in flight; host stages of later reads overlap the device round
    # trips (VERDICT.md round-3 item 1)
    window = deque()
    max_window = int(os.environ.get("VACMAP_TPU_FILL_WINDOW", "32"))
    from .pipeline.mapper import PendingLines

    while True:
        item = raw_q.get()
        if isinstance(item, int):
            raw_q.put(item)  # release sibling threads of this worker
            break
        name, seq, qual, comment = item
        if use_async:
            r = mapper.map_read_deferred(name, seq, qual, comment)
            if isinstance(r, PendingLines):
                window.append(r)
                if len(window) >= max_window:
                    emit(window.popleft().finish())
            else:
                emit(r)
        else:
            emit(map_fn(name, seq, qual, comment))
    while window:
        emit(window.popleft().finish())
    if batch:
        cooked_q.put(batch)


def _worker(raw_q, cooked_q, index, cfg, fill_client=None):
    import threading as _threading

    use_async = fill_client is not None and cfg.mode != "asm"
    host_defer = fill_client is None and cfg.mode != "asm"
    # with the device service attached, each worker process runs a
    # second mapping thread: blocking device waits (divergence edit
    # batches, non-deferred fills) overlap the sibling's host stages.
    # Host-only workers stay single-threaded (GIL: no host win) but use
    # the same deferred window so the striped fill kernel sees
    # cross-read batches (HostBatchFillAligner).
    n_threads = int(os.environ.get(
        "VACMAP_TPU_WORKER_THREADS", "2" if use_async else "1"
    ))
    mappers = []
    for _ in range(max(n_threads, 1)):
        m = Mapper(index, cfg)
        if use_async:
            m.global_aligner = fill_client
        elif host_defer:
            from .pipeline.extend import HostBatchFillAligner

            m.global_aligner = HostBatchFillAligner()
        mappers.append(m)
    use_async = use_async or host_defer
    if len(mappers) == 1:
        _worker_loop(raw_q, cooked_q, mappers[0], cfg, use_async)
    else:
        ts = [
            _threading.Thread(
                target=_worker_loop,
                args=(raw_q, cooked_q, m, cfg, use_async),
            )
            for m in mappers
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    cooked_q.put(1)  # per-worker done sentinel


def _writer(cooked_q, path, header, n_workers: int):
    # the writer is constructed HERE, in the writer process: building it
    # pre-fork leaves the header in a buffered handle that every forked
    # process flushes at exit (duplicate headers in the output)
    writer = OutputWriter(path, header)
    done = 0
    while done < n_workers:
        item = cooked_q.get()
        if isinstance(item, int):
            done += 1
            continue
        if item:
            writer.write_lines(item)
    writer.close()


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        format="%(levelname)s: %(asctime)s %(message)s",
        datefmt="%m/%d/%Y %I:%M:%S %p",
        level=logging.INFO,
    )
    raw = list(sys.argv[1:] if argv is None else argv)
    if "--prewarm" in raw:
        return _prewarm()
    args, _ = build_parser().parse_known_args(argv)
    if args.debug:
        from . import trace

        trace.enable()
    if os.environ.get("VACMAP_TPU_PLATFORM"):
        # deployment platform pin (e.g. cpu for multi-host CPU runs and
        # the jax.distributed boot test): this environment's
        # sitecustomize pre-registers accelerator plugins and ignores
        # JAX_PLATFORMS, so pin via jax.config before backend init
        import jax

        jax.config.update("jax_platforms",
                          os.environ["VACMAP_TPU_PLATFORM"])
    if getattr(args, "coordinator", None):
        from .parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    # multi-host read sharding works with or without jax.distributed
    # (collectives need it; pure read-DP does not)
    n_proc = args.num_processes or 1
    proc_id = args.process_id or 0
    shard = (proc_id, n_proc)
    final_out = args.o
    if n_proc > 1 and args.o != "-":
        # per-process parts on the shared output directory; process 0
        # merges them into the single file the reference produces once
        # every part's .done sentinel appears (io/merge_parts.py)
        base, ext = args.o, ""
        for suffix in (".sorted.bam", ".sam", ".bam"):
            if args.o.endswith(suffix):
                base, ext = args.o[: -len(suffix)], suffix
                break
        args.o = f"{base}.part{proc_id}{ext}"
        log.info("process %d/%d writes %s", proc_id, n_proc, args.o)
    cfg = config_from_args(args)
    read_paths = expand_read_paths(args.read)
    for f in read_paths:
        if not os.path.isfile(f):
            log.error("Read file not found: %s", f)
            return 1
    if not os.path.isfile(args.ref) and not os.path.isdir(args.ref):
        log.error("Reference file not found: %s", args.ref)
        return 1
    if args.o != "-":
        if not (args.o.endswith(".sam") or args.o.endswith(".bam")):
            raise ValueError("Output must end with .sam/.bam/.sorted.bam or '-'")
        if os.path.isfile(args.o) and not args.force:
            raise ValueError("Output file exists; use --force to overwrite")
    created_workdir = None
    if cfg.mode == "asm" and cfg.workdir:
        # refuse a pre-existing workdir exactly like the reference
        # (mammap_asm.py:23208-23210) — protects user data from the
        # end-of-run cleanup
        if os.path.exists(cfg.workdir):
            log.error(
                "Working directory %s already exists; refusing to reuse it",
                cfg.workdir,
            )
            return 1
        os.makedirs(cfg.workdir)
        created_workdir = cfg.workdir

    index = load_or_build_index(args.ref, args.k, args.w,
                                not args.nowriteindex, lowmem=args.lowmem)
    mapper0 = Mapper(index, cfg)
    header = mapper0.header_lines(cli=" ".join(sys.argv))

    n_workers = max(cfg.threads, 1)
    if cfg.mode == "asm":
        n_workers = 1  # contigs are huge; queue depth 1 (vacmap:394-401)
    map_fn0 = mapper0.map_contig if cfg.mode == "asm" else mapper0.map_read
    # device fill offload: "auto" probes for an accelerator (the probe
    # runs in the forked service process; the parent never touches jax)
    want_fills = args.device_fills != "off" and cfg.mode != "asm"
    st = time.time()
    count = 0
    if cfg.backend == "jax" and cfg.mode != "asm":
        # a dead compile relay blocks jax backend init forever (in C
        # land, uninterruptible) — probe in a SUBPROCESS and fall back
        # to the host fork deployment instead of hanging the run
        if not _probe_accelerator():
            log.warning(
                "--backend jax requested but no accelerator answered the "
                "probe; falling back to the host backend"
            )
            cfg = dataclasses.replace(cfg, backend="auto")
            mapper0 = Mapper(index, cfg)
            map_fn0 = (mapper0.map_contig if cfg.mode == "asm"
                       else mapper0.map_read)
    if cfg.backend == "jax" and cfg.mode != "asm":
        # batched device executor: the whole batch's chaining DP runs as
        # one Pallas call; host refinement overlaps on threads
        from .parallel import runtime
        from .pipeline.executor import BatchExecutor

        runtime.enable_compilation_cache()
        ex = BatchExecutor(mapper0, device_fills=want_fills)
        writer = OutputWriter(args.o, header)

        def counted():
            nonlocal count
            for rec in _dedup_records(read_paths, cfg, shard=shard):
                count += 1
                yield rec

        try:
            for lines in ex.map_stream(
                counted(), cfg.batch_reads, n_threads=cfg.threads
            ):
                if lines:
                    writer.write_lines(lines)
        finally:
            writer.close()
            ex.close()
    elif n_workers == 1:
        from collections import deque

        from .pipeline.mapper import PendingLines

        # the device-owning service runs in a child process even for one
        # worker: jax init / Mosaic prewarm never blocks the read loop,
        # and the client host-fills until the service reports ready
        writer = OutputWriter(args.o, header)
        dfa = None
        fill_handle1 = None
        if want_fills:
            from .parallel.fill_service import start_fill_server

            fill_handle1 = start_fill_server(1, wait_ready=False)
            if fill_handle1 is not None:
                dfa = fill_handle1.client(0)
                mapper0.global_aligner = dfa
                log.info("device fill service starting (background)")
        if dfa is None and cfg.mode != "asm":
            # host deferred window: cross-read striped fill batches
            from .pipeline.extend import HostBatchFillAligner

            dfa = HostBatchFillAligner()
            mapper0.global_aligner = dfa
        window: deque = deque()
        max_window = int(os.environ.get("VACMAP_TPU_FILL_WINDOW", "32"))
        for rec in _dedup_records(read_paths, cfg, shard=shard):
            name, seq = rec[0], rec[1]
            qual = rec[2] if len(rec) > 2 else None
            comment = rec[3] if len(rec) > 3 else None
            if dfa is not None:
                r = mapper0.map_read_deferred(name, seq, qual, comment)
                if isinstance(r, PendingLines):
                    window.append(r)
                    if len(window) >= max_window:
                        r = window.popleft().finish()
                    else:
                        r = None
                if r:
                    writer.write_lines(r)
            else:
                lines = map_fn0(name, seq, qual, comment)
                if lines:
                    writer.write_lines(lines)
            count += 1
        while window:
            lines = window.popleft().finish()
            if lines:
                writer.write_lines(lines)
        writer.close()
        if fill_handle1 is not None:
            fill_handle1.stop()
    else:
        ctx = mp.get_context("fork")
        fill_handle = None
        if want_fills:
            from .parallel.fill_service import start_fill_server

            fill_handle = start_fill_server(n_workers, ctx=ctx,
                                            wait_ready=False)
            if fill_handle is not None:
                log.info("device fill service starting (%d clients)",
                         n_workers)
        raw_q = ctx.Queue(maxsize=n_workers * 200)
        cooked_q = ctx.Queue(maxsize=n_workers * 200)
        workers = [
            ctx.Process(
                target=_worker,
                args=(raw_q, cooked_q, index, cfg,
                      fill_handle.client(i) if fill_handle else None),
            )
            for i in range(n_workers)
        ]
        for w in workers:
            w.start()
        wproc = ctx.Process(target=_writer,
                            args=(cooked_q, args.o, header, n_workers))
        wproc.start()
        for rec in _dedup_records(read_paths, cfg, shard=shard):
            name, seq = rec[0], rec[1]
            qual = rec[2] if len(rec) > 2 else None
            comment = rec[3] if len(rec) > 3 else None
            raw_q.put((name, seq, qual, comment))
            count += 1
            if count % 100_000 == 0:
                dt = max(time.time() - st, 1e-3)
                log.info("%d reads queued (%.0f/s)", count, count / dt)
        for _ in workers:
            raw_q.put(0)
        for w in workers:
            w.join()
        wproc.join()
        if fill_handle is not None:
            fill_handle.stop()

    if created_workdir is not None:
        import shutil

        shutil.rmtree(created_workdir, ignore_errors=True)
    if n_proc > 1 and final_out != "-":
        from .io.merge_parts import finish_multihost

        finish_multihost(final_out, args.o, proc_id, n_proc)
        if proc_id == 0:
            log.info("merged %d parts into %s", n_proc, final_out)
    dt = max(time.time() - st, 1e-3)
    log.info(
        "Done: %d sequences in %dh%dm%ds (%.1f/s)",
        count, int(dt // 3600), int(dt % 3600 // 60), int(dt % 60), count / dt,
    )
    from . import trace

    if trace.enabled():
        log.info("stage timing:\n%s", trace.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
