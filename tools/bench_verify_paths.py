#!/usr/bin/env python
"""Compare the device overlap-verification paths on real hardware:

  - verify_windows        : XLA roll-align + compare (round-3 production)
  - verify_windows_pallas : old Pallas compare kernel after an XLA align
  - verify_windows_fused  : fused Pallas kernel, row-gather + transpose
                            preamble (PRODUCTION since round 4)
  - verify_windows_fused_t: fused kernel, transposed-table lane-gather

All replace the reference's byte-wise substring compares
(reference: src/BuildGraph/src/OverlapGraph.cpp:401-478,638-674).

Each path runs in a fresh subprocess: on a tunneled chip, a device->host
readback in the same process degrades subsequent dispatch into a
synchronous (latency-bound) mode, poisoning any later timing.

Usage: python tools/bench_verify_paths.py   (runs on the default JAX backend)

History: the 1e10-1e11 pairs/s rates this file recorded in rounds 1-2 were
measurement artifacts (terminal value-dedup + premature block_until_ready,
see BASELINE.md round-3 correction).  Honest rates on the v5e chip
(bench.py fori-loop harness, round 4): xla 1.27e7, fused 1.74e8,
fused_t 1.76e8 pairs/s — the fused kernels sit at the measured whole-row
gather bound; the XLA path is align-issue-bound ~13x below it.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, tempfile, os
sys.path.insert(0, %(root)r)
mode = sys.argv[1]
import numpy as np, jax
import bench
if len(sys.argv) > 2:
    bench.GENOME_LEN = int(sys.argv[2])
from disco_tpu.overlap.verify import (make_packed_all, verify_windows,
                                      verify_windows_pallas)
from disco_tpu.overlap.fused_kernel import (verify_windows_fused,
                                            verify_windows_fused_t)
fn = {"xla": verify_windows, "pallas": verify_windows_pallas,
      "fused": verify_windows_fused, "fused_t": verify_windows_fused_t}[mode]
with tempfile.TemporaryDirectory() as td:
    fasta = os.path.join(td, "bench.fasta")
    bench.make_dataset(fasta)
    store, r1, rows2, o1, o2, n = bench.candidate_batch(fasta)
    packed_np = make_packed_all(store.packed, store.packed_rc)
    if mode == "fused_t":
        packed_np = np.ascontiguousarray(np.asarray(packed_np).T)
    packed_all = jax.device_put(packed_np)
    total = len(r1)
    dev = [jax.device_put(x) for x in (r1, rows2, o1, o2, n)]
    out = fn(packed_all, *dev, n_words=store.n_words)
    out.block_until_ready()
    # chained timing: each rep's o1 consumes a scalar of the previous
    # output, forcing genuinely sequential executions — on tunneled chips
    # block_until_ready alone can return before large executions finish,
    # yielding physically impossible rates (round-3 finding)
    r1d, rows2d, o1d, o2d, nd = dev
    reps = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        o1x = o1d if out is None else \
            o1d + (out[0].astype(o1d.dtype) * 0)
        out = fn(packed_all, r1d, rows2d, o1x, o2d, nd,
                 n_words=store.n_words)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # checksum AFTER timing (readback poisons later dispatch on tunnels)
    csum = int(np.asarray(out)[:total].sum())
    avg_n = float(np.asarray(n).mean())
    ws = packed_all.nbytes + sum(x.nbytes for x in dev)
    print(f"{mode}\t{total / dt:.6e}\t{csum}\t{total}\t{avg_n:.2f}\t"
          f"{store.n_words}\t{ws}")
"""


# HBM peak bandwidth per chip for the roofline denominator (v5e: 819 GB/s,
# public spec; override with DISCO_TPU_HBM_GBPS for other chips)
HBM_PEAK_GBPS = float(os.environ.get("DISCO_TPU_HBM_GBPS", 819.0))


def roofline(rate: float, avg_n: float, n_words: int, ws: int) -> str:
    """Bytes-per-pair roofline bracket for the gather+compare pass.

    implementation bytes (upper bound): the loop gathers 4 uint32 words
    per word-step over the FULL row (n_words steps, masked tail) + 20 B
    of per-pair index/length inputs + 1 B output — counts every gathered
    word as HBM traffic, ignoring row-word reuse.  algorithmic bytes
    (lower bound): the two compared windows' packed bases only
    (2 * avg_n / 4).  When the whole working set fits on-chip (VMEM/CMEM)
    the pass is in the COMPUTE-bound regime and the HBM fraction is
    meaningless — the regime is printed so the right number is read."""
    impl_b = 16 * n_words + 20 + 1
    algo_b = 2 * avg_n / 4
    hi = rate * impl_b / 1e9
    lo = rate * algo_b / 1e9
    regime = ("on-chip-resident (compute-bound regime)" if ws < 64 << 20
              else "HBM-streaming regime")
    return (f"working set {ws / 1e6:.0f} MB — {regime}; "
            f"bytes/pair impl={impl_b} algo={algo_b:.0f}; "
            f"implied HBM demand {lo:.0f}-{hi:.0f} GB/s "
            f"vs {HBM_PEAK_GBPS:.0f} GB/s peak "
            f"({100 * lo / HBM_PEAK_GBPS:.0f}-"
            f"{100 * hi / HBM_PEAK_GBPS:.0f}%)")


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-len", type=int, default=0,
                    help="override the bench dataset size (0 = bench.py "
                         "default 400kb, on-chip-resident; use 4600000 for "
                         "the HBM-streaming regime)")
    args = ap.parse_args()

    results = {}
    for mode in ("xla", "pallas", "fused", "fused_t"):
        cmd = [sys.executable, "-c", _CHILD % {"root": ROOT}, mode]
        if args.genome_len:
            cmd.append(str(args.genome_len))
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr)
            raise SystemExit(p.returncode)
        line = p.stdout.strip().splitlines()[-1]
        _, rate, csum, total, avg_n, n_words, ws = line.split("\t")
        results[mode] = (float(rate), int(csum), int(total))
        print(f"{mode:7s}: {float(rate):.3e} pairs/s "
              f"(verified {csum}/{total})")
        print(f"         {roofline(float(rate), float(avg_n), int(n_words), int(ws))}")
    match = results["xla"][1:] == results["pallas"][1:]
    print(f"verified-set checksums identical: {match}")
    if not match:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
