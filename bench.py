"""Round benchmark: overlap-verification throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "overlaps_verified_per_s_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

The workload is the overlap phase's inner loop — the reference's hot path
(byte-wise substring compares inside hash-bucket probes,
reference: src/BuildGraph/src/OverlapGraph.cpp:401-478,638-674) — expressed
as one device batch: for every candidate (read1 window j, read2, orientation)
verify the suffix-prefix/containment window over 2-bit packed words.

vs_baseline divides by the reference buildG's effective rate on this machine
(same candidate count / buildG wall-clock with all host cores), measured
once and cached in refbuild/bench_baseline.json.
"""
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

GENOME_LEN = 400_000
COVERAGE = 25
READ_LEN = 250
MIN_OVERLAP = 40
SEED = 42


def make_dataset(path: str) -> None:
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_testdata.py"), path,
         "--genome-len", str(GENOME_LEN), "--coverage", str(COVERAGE),
         "--read-len", str(READ_LEN), "--insert", "600",
         "--seed", str(SEED)],
        check=True, stdout=subprocess.DEVNULL)


def candidate_batch(fasta: str):
    """Host prep: read store, fingerprint table, candidate windows."""
    from disco_tpu.index.table import FingerprintTable
    from disco_tpu.io.readstore import ReadStore
    from disco_tpu.overlap import relation as R

    store = ReadStore.from_files([fasta], [], MIN_OVERLAP,
                                 reference_task_order=False)
    k = MIN_OVERLAP - 1
    table = FingerprintTable.build(store, k)
    qread, qj, qcode = R.window_codes(store, k)
    lo, hi = table.lookup_ranges(qcode)
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())
    pair_q = np.repeat(np.arange(len(qread), dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(total, dtype=np.int64) - cum[pair_q]
    tpos = lo[pair_q] + rank
    r1 = qread[pair_q].astype(np.int32)
    j = qj[pair_q]
    r2 = table.read[tpos]
    orient = table.orient[tpos]
    len1 = store.lengths[r1].astype(np.int32)
    len2 = store.lengths[r2].astype(np.int32)
    suffix_case = R._IS_SUFFIX_CASE[orient]
    use_rc = R._USE_RC[orient]
    e_valid = np.where(suffix_case, j <= len2 - k, (len1 - j) < len2)
    e_valid &= (j >= 1) & (r1 != r2)
    e_n = np.where(suffix_case, j + k, len1 - j).astype(np.int32)
    e_n = np.where(e_valid, e_n, 0)
    e_o1 = np.where(suffix_case, 0, j).astype(np.int32)
    e_o2 = np.maximum(np.where(suffix_case, len2 - e_n, 0), 0).astype(np.int32)
    rows2 = (r2 + np.where(use_rc, store.n_reads, 0)).astype(np.int32)
    return store, r1, rows2, e_o1, e_o2, e_n


def _tile_spans(r1: np.ndarray):
    """Per-tile (max-min) row spans of the r1-sorted candidate stream —
    the quantity the MXU-fetch precondition bounds."""
    from disco_tpu.overlap.fused_kernel import TILE
    nt = len(r1) // TILE
    if nt == 0:
        return {"p50": 0, "p99": 0, "max": 0}
    t = r1[:nt * TILE].reshape(nt, TILE)
    spans = t.max(axis=1) - t.min(axis=1)
    return {"p50": int(np.percentile(spans, 50)),
            "p99": int(np.percentile(spans, 99)),
            "max": int(spans.max())}


def main() -> None:
    import jax
    from disco_tpu.overlap.verify import make_packed_all, verify_windows

    # DISCO_TPU_BENCH_PATH selects the measured verify implementation
    # (default fused_mxu3: BOTH row fetches inside the kernel over the
    # BFS-relabeled locality layout — no per-pair gather at all;
    # "fused_mxu2" = r1 in-kernel + r2 XLA gather; "fused" = gather-only
    # variant; "xla" = the round-3 align path)
    path = os.environ.get("DISCO_TPU_BENCH_PATH", "fused_mxu3")

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "bench.fasta")
        make_dataset(fasta)
        store, r1, rows2, o1, o2, n = candidate_batch(fasta)
        full_total = len(r1)
        # the fori-loop harness amortizes reps, so a 256k-pair slice
        # measures the same per-pair rate while keeping host->device
        # transfer small (the tunneled chip moves MBs per second at best);
        # the reference baseline stays normalized by the FULL workload.
        # The slice is CONTIGUOUS (preserves the r1-sorted tile spans the
        # MXU-fetch path depends on) but CENTERED — the head of the
        # workload has atypically small spans, which would flatter the
        # measured rate; the per-tile span p50/p99 of the full workload
        # and of the slice are reported so the representativeness is
        # checkable.
        cap = 1 << 18
        span_stats = {}
        from disco_tpu.overlap.fused_kernel import SPAN_ROWS, TILE
        span_stats["full"] = _tile_spans(np.asarray(r1))
        if path == "fused_mxu3":
            # BFS-relabel over the FULL candidate graph for the
            # both-sides-fetch kernel (host prep, like the candidate sort
            # itself; ~0.9 s for 1.7M pairs — a slice-only graph is too
            # sparse and BFS wanders, tools/exp_locality.py).  The kernel
            # re-checks the span precondition in-graph and falls back if
            # violated.
            from disco_tpu.overlap.locality import relabel_workload
            from disco_tpu.overlap.verify import make_packed_all
            pa = np.asarray(make_packed_all(store.packed, store.packed_rc))
            (pa_relab, r1, rows2, _perm, _label, o1, o2, n) = \
                relabel_workload(store.n_reads, pa, r1, rows2, o1, o2, n)
            store._packed_relab = pa_relab
            span_stats["mxu3_r2"] = _tile_spans(np.asarray(rows2))
        if len(r1) > cap:
            s0 = ((len(r1) - cap) // 2 // TILE) * TILE
            r1, rows2, o1, o2, n = (x[s0:s0 + cap]
                                    for x in (r1, rows2, o1, o2, n))
        span_stats["slice"] = _tile_spans(np.asarray(r1))
        if path == "fused_mxu3":
            span_stats["relabeled_r2_full"] = span_stats.pop("mxu3_r2")
            span_stats["relabeled_r2_slice"] = _tile_spans(np.asarray(rows2))
        if path in ("fused_mxu", "fused_mxu2"):
            # the MXU-fetch kernel checks its sorted/span precondition
            # IN-GRAPH and falls back per batch; trip the coarse host
            # guard only to label the recorded path honestly
            nt = len(r1) // TILE
            r1t = np.asarray(r1[:nt * TILE]).reshape(nt, TILE)
            span = int((r1t.max(axis=1) - r1t.min(axis=1)).max())
            if (r1t[:, 1:] < r1t[:, :-1]).any() or span >= SPAN_ROWS:
                print(f"# fused_mxu span/sort guard tripped (span={span});"
                      " falling back to fused", file=sys.stderr)
                path = "fused"
        packed_np = np.asarray(make_packed_all(store.packed, store.packed_rc))
        if path == "fused_t":
            packed_np = np.ascontiguousarray(packed_np.T)
        elif path in ("fused_mxu", "fused_mxu2"):
            from disco_tpu.overlap.fused_kernel import pack_lines
            lines_np, _ = pack_lines(packed_np)
            packed_np = ((lines_np, packed_np) if path == "fused_mxu2"
                         else lines_np)
        elif path == "fused_mxu3":
            # 16-word int8 layout for <=256 bp reads (half the one-hot
            # FLOPs, 2x MXU rate); 32-word bf16 layout otherwise
            if store.n_words <= 16:
                from disco_tpu.overlap.fused_kernel import pack_lines16
                packed_np, _ = pack_lines16(store._packed_relab)
            else:
                from disco_tpu.overlap.fused_kernel import pack_lines
                packed_np, _ = pack_lines(store._packed_relab)
        packed_all = jax.device_put(packed_np)  # pytree ok
        if path == "xla":
            verify_fn = verify_windows
        else:
            from disco_tpu.overlap.fused_kernel import (
                verify_windows_fused, verify_windows_fused_mxu,
                verify_windows_fused_mxu_both,
                verify_windows_fused_mxu_both16, verify_windows_fused_t)
            verify_fn = {"fused_t": verify_windows_fused_t,
                         "fused_mxu": verify_windows_fused_mxu,
                         "fused_mxu2": verify_windows_fused_mxu,
                         "fused_mxu3": (verify_windows_fused_mxu_both16
                                        if store.n_words <= 16 else
                                        verify_windows_fused_mxu_both),
                         }.get(path, verify_windows_fused)
        total = len(r1)
        dev = [jax.device_put(x) for x in (r1, rows2, o1, o2, n)]
        # Measurement design (round-3 rework): the whole rep loop runs
        # INSIDE one jit as a lax.fori_loop whose body depends on the
        # iteration index and carries a scalar — one dispatch, one scalar
        # readback.  Anything else is untrustworthy on a tunneled chip:
        # host-side rep loops over identical inputs get DEDUPLICATED by
        # the terminal (round-1/2 recorded 2.3e10-8.2e10 pairs/s this
        # way — inflated), block_until_ready can return before large
        # executions finish, and any readback degrades later dispatch
        # into a per-call round-trip mode.  With the in-program loop the
        # device does >=several seconds of real work per dispatch and
        # every latency amortizes to nothing.
        import jax.numpy as jnp
        from jax import lax
        r1d, rows2d, o1d, o2d, nd = dev
        n_words = store.n_words

        @jax.jit
        def bench_kernel(packed_all, r1, rows2, o1, o2, n, iters):
            def body(i, acc):
                # roll EVERY input by a whole number of kernel tiles per
                # iteration: pairs stay intact (the verified set — and
                # its sum — is iteration-invariant) and per-tile contents
                # are preserved (tile-multiple shifts keep the sorted/span
                # preconditions), but the GATHER/FETCH indices become
                # i-dependent, so XLA's LICM cannot hoist the row fetches
                # out of the loop (round-4 lesson: with loop-invariant
                # rows the gathers hoist and the "measured" rate becomes
                # the align-kernel-only fiction, ~1.4e9)
                sh = (i % 4) * 1024
                r1x, rows2x, o1x, o2x, nx = (
                    jnp.roll(x, sh) for x in (r1, rows2, o1, o2, n))
                ok = verify_fn(packed_all, r1x, rows2x, o1x, o2x, nx,
                               n_words=n_words)
                return acc + ok.sum(dtype=jnp.int64)
            return lax.fori_loop(0, iters, body, jnp.int64(0))

        # warmup + calibration (includes compile and the one-time
        # transfer-path init; iters rides as a DYNAMIC scalar so repeat
        # calls neither recompile nor dedupe)
        jnp_i = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        int(bench_kernel(packed_all, r1d, rows2d, o1d, o2d, nd, jnp_i(2)))
        t0 = time.perf_counter()
        int(bench_kernel(packed_all, r1d, rows2d, o1d, o2d, nd, jnp_i(10)))
        cal = (time.perf_counter() - t0) / 10
        iters = max(int(8.0 / max(cal, 1e-9)), 20)
        rate = 0.0
        for it in (iters, iters + 1):
            t0 = time.perf_counter()
            int(bench_kernel(packed_all, r1d, rows2d, o1d, o2d, nd,
                             jnp_i(it)))
            dt = (time.perf_counter() - t0) / it
            rate = max(rate, total / dt)

        baseline = _reference_rate(fasta, full_total)

    payload = {
        "metric": "overlaps_verified_per_s_chip",
        "value": round(rate),
        "unit": "pairs/s",
        "vs_baseline": (round(rate / baseline, 2) if baseline else None),
        "verify_path": path,
        "tile_spans": span_stats,
    }
    # merge the cached end-to-end buildG wall clocks (tools/bench_e2e.py:
    # device backend vs native backend vs reference, byte-identical
    # outputs) if a run exists on this machine
    e2e = ROOT / "refbuild" / "bench_e2e.json"
    if e2e.exists():
        try:
            data = json.loads(e2e.read_text())
            for key in ("device", "native", "reference_t1",
                        "outputs_identical", "genome_len"):
                if key in data:
                    payload[f"buildg_e2e_{key}"] = data[key]
        except Exception:
            pass
    print(json.dumps(payload))


def _reference_rate(fasta: str, total_pairs: int):
    """Reference buildG rate on all host cores: same candidate workload /
    buildG wall-clock.  Measured once, cached."""
    cache = ROOT / "refbuild" / "bench_baseline.json"
    key = f"{GENOME_LEN}:{COVERAGE}:{READ_LEN}:{MIN_OVERLAP}:{SEED}"
    if cache.exists():
        try:
            data = json.loads(cache.read_text())
            if data.get("key") == key:
                return data["pairs_per_s"]
        except Exception:
            pass
    buildg = ROOT / "refbuild" / "buildG"
    if not buildg.exists():
        return None
    nthreads = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as td:
        cfg = os.path.join(td, "b.cfg")
        with open(cfg, "w") as f:
            f.write(f"MinOverlap4BuildGraph = {MIN_OVERLAP}\n")
        t0 = time.perf_counter()
        subprocess.run(
            [str(buildg), "-pe", fasta, "-f", os.path.join(td, "REF"),
             "-p", cfg, "-t", str(nthreads), "-m", "8"],
            check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        wall = time.perf_counter() - t0
    rate = total_pairs / wall
    try:
        cache.write_text(json.dumps(
            {"key": key, "pairs_per_s": rate, "buildG_wall_s": wall,
             "threads": nthreads}))
    except OSError:
        pass
    return rate


if __name__ == "__main__":
    main()
