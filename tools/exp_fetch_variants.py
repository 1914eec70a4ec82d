"""Round-5 fetch experiments: isolate why the scalar-prefetch pipelined
line fetch regressed vs the round-4 synchronous in-kernel DMA, and measure
the component bounds (r2 gather alone, kernel alone).

Variants (all bit-checked against verify_windows_fused):
  sync    — round-4 kernel: make_async_copy at tile start (one 8 KB copy)
  pipe    — round-5 kernel: two 16-line blocks via scalar-prefetch index maps
  pipe_nc — pipe without the lax.cond guard (direct call)
  gather  — r2-side XLA row gather only (the serial component bound)
  fused   — gather-both-sides fused kernel (round-3/4 production)

Methodology: lax.fori_loop inside one jit, i-dependent indices, scalar
carry (see bench.py for why anything else lies on this tunnel).
"""
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from disco_tpu.overlap import fused_kernel as FK  # noqa: E402

TILE = FK.TILE
W32 = FK.W32


# ---------------------------------------------------------------------------
# round-4 sync-DMA kernel (reconstructed for comparison)
# ---------------------------------------------------------------------------
K_LINES = 16


def _sync_kernel(blines_ref, rl_ref, o1_ref, o2_ref, n_ref, b_ref, hbm_ref,
                 out_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(blines_ref[t], K_LINES), :], scratch, sem)
    cp.start()
    cp.wait()
    rl = rl_ref[...]
    line = rl >> jnp.int32(2)
    phase = rl & jnp.int32(3)
    width = rl.shape[1]
    lio = lax.broadcasted_iota(jnp.int32, (K_LINES, width), 0)
    hp = lax.Precision.HIGHEST
    dn = (((0,), (0,)), ((), ()))
    a_hi = jnp.zeros((W32, width), jnp.float32)
    a_lo = jnp.zeros((W32, width), jnp.float32)
    for q in range(4):
        seg = scratch[:, q * W32:(q + 1) * W32]
        hi = pltpu.bitcast(seg >> jnp.uint32(16),
                           jnp.int32).astype(jnp.float32)
        lo = pltpu.bitcast(seg & jnp.uint32(0xFFFF),
                           jnp.int32).astype(jnp.float32)
        oh = jnp.where((lio == line) & (phase == jnp.int32(q)),
                       jnp.float32(1), jnp.float32(0))
        a_hi += lax.dot_general(hi, oh, dn, precision=hp,
                                preferred_element_type=jnp.float32)
        a_lo += lax.dot_general(lo, oh, dn, precision=hp,
                                preferred_element_type=jnp.float32)
    a = ((pltpu.bitcast(a_hi.astype(jnp.int32), jnp.uint32)
          << jnp.uint32(16))
         | pltpu.bitcast(a_lo.astype(jnp.int32), jnp.uint32))
    d1, bit1 = FK._split_off(o1_ref)
    d2, bit2 = FK._split_off(o2_ref)
    aa = FK._align(a, d1, bit1, W32)
    bb = FK._align(b_ref[:], d2, bit2, W32)
    out_ref[:] = FK._masked_cmp(aa, bb, n_ref[...], W32, width)


def verify_sync(lines, packed_orig, rows1, rows2, o1, o2, n):
    pp = rows1.shape[0]
    nt = pp // TILE
    b17 = packed_orig[rows2].T
    b = jnp.concatenate(
        [b17, jnp.zeros((W32 - b17.shape[0], pp), jnp.uint32)], axis=0)
    r1t = rows1.reshape(nt, TILE)
    base_rows = r1t[:, 0] & ~jnp.int32(3)
    blines = base_rows >> jnp.int32(2)
    rl = (r1t - base_rows[:, None]).reshape(1, pp)

    def _row(i, *_):
        return (jnp.int32(0), i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((W32, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K_LINES, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        _sync_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
    )(blines, rl, o1.reshape(1, pp), o2.reshape(1, pp),
      n.reshape(1, pp), b, lines)
    return out.reshape(pp).astype(jnp.bool_)


def verify_pipe_nc(lines, packed_orig, rows1, rows2, o1, o2, n):
    """Round-5 pipelined kernel WITHOUT the cond guard."""
    pp = rows1.shape[0]
    b17 = packed_orig[rows2].T
    b = jnp.concatenate(
        [b17, jnp.zeros((W32 - b17.shape[0], pp), jnp.uint32)], axis=0)
    ablk, rl, _ok = FK._mxu_prep(rows1, pp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pp // TILE,),
        in_specs=FK._line_specs() + [FK._row_spec()] * 4
        + [pl.BlockSpec((W32, TILE), lambda i, *_: (jnp.int32(0), i),
                        memory_space=pltpu.VMEM)],
        out_specs=FK._row_spec(),
    )
    out = pl.pallas_call(
        FK._mxu2_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
    )(ablk, lines, lines, rl, o1.reshape(1, pp), o2.reshape(1, pp),
      n.reshape(1, pp), b)
    return out.reshape(pp).astype(jnp.bool_)


def main():
    sys.path.insert(0, str(ROOT))
    import bench as B

    import tempfile
    import os
    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "bench.fasta")
        B.make_dataset(fasta)
        store, r1, rows2, o1, o2, n = B.candidate_batch(fasta)
    full_arrays = tuple(np.asarray(x) for x in (r1, rows2, o1, o2, n))
    cap = 1 << 18
    s0 = ((len(r1) - cap) // 2 // TILE) * TILE
    r1, rows2, o1, o2, n = (np.asarray(x[s0:s0 + cap]).astype(np.int32)
                            for x in (r1, rows2, o1, o2, n))
    from disco_tpu.overlap.verify import make_packed_all
    packed_np = np.asarray(make_packed_all(store.packed, store.packed_rc))
    lines_np, _ = FK.pack_lines(packed_np)
    lines = jax.device_put(lines_np)
    packed_orig = jax.device_put(packed_np)
    dev = [jax.device_put(x) for x in (r1, rows2, o1, o2, n)]
    r1d, rows2d, o1d, o2d, nd = dev
    total = len(r1)
    n_words = store.n_words

    def harness(fn, label, check=None):
        @jax.jit
        def bench_kernel(r1, rows2, o1, o2, n, iters):
            def body(i, acc):
                # tile-multiple roll: keeps pairs + per-tile preconditions
                # intact but makes every fetch index i-dependent, so LICM
                # cannot hoist the row fetches (see bench.py)
                sh = (i % 4) * 1024
                r1x, rows2x, o1x, o2x, nx = (
                    jnp.roll(x, sh) for x in (r1, rows2, o1, o2, n))
                ok = fn(r1x, rows2x, o1x, o2x, nx)
                return acc + ok.sum(dtype=jnp.int64)
            return lax.fori_loop(0, iters, body, jnp.int64(0))

        v0 = int(bench_kernel(r1d, rows2d, o1d, o2d, nd,
                              jnp.asarray(2, jnp.int32)))
        t0 = time.perf_counter()
        int(bench_kernel(r1d, rows2d, o1d, o2d, nd,
                         jnp.asarray(10, jnp.int32)))
        cal = (time.perf_counter() - t0) / 10
        iters = max(int(6.0 / max(cal, 1e-9)), 20)
        t0 = time.perf_counter()
        int(bench_kernel(r1d, rows2d, o1d, o2d, nd,
                         jnp.asarray(iters, jnp.int32)))
        dt = (time.perf_counter() - t0) / iters
        rate = total / dt
        tag = ""
        if check is not None:
            tag = " check=OK" if v0 == check else f" check=MISMATCH({v0}!={check})"
        print(f"{label:10s} {rate:.3e} pairs/s{tag}", flush=True)
        return v0, rate

    # reference value for bit-checks: fused gather path, 2 iters
    from disco_tpu.overlap.fused_kernel import (verify_windows_fused,
                                                verify_windows_fused_mxu)

    def f_fused(r1, rows2, o1, o2, n):
        return verify_windows_fused(packed_orig, r1, rows2, o1, o2, n,
                                    n_words=n_words)

    def f_pipe(r1, rows2, o1, o2, n):
        return verify_windows_fused_mxu((lines, packed_orig), r1, rows2,
                                        o1, o2, n, n_words=n_words)

    def f_sync(r1, rows2, o1, o2, n):
        return verify_sync(lines, packed_orig, r1, rows2, o1, o2, n)

    def f_pipe_nc(r1, rows2, o1, o2, n):
        return verify_pipe_nc(lines, packed_orig, r1, rows2, o1, o2, n)

    def f_gather(r1, rows2, o1, o2, n):
        # r2-side gather ONLY: sum a word so the gather can't be elided
        b = packed_orig[rows2]
        return (b[:, 0] + o1.astype(jnp.uint32)) > 0

    ref, _ = harness(f_fused, "fused", None)
    harness(f_sync, "sync", ref)
    harness(f_pipe, "pipe", ref)
    harness(f_pipe_nc, "pipe_nc", ref)
    harness(f_gather, "gather", None)

    # both-sides in-kernel fetch over the BFS-relabeled workload.  The
    # relabel graph must be the FULL candidate set (a slice-only graph is
    # too sparse: BFS wanders and the spans blow past the kernel windows)
    from disco_tpu.overlap.fused_kernel import verify_windows_fused_mxu_both
    from disco_tpu.overlap.locality import relabel_workload
    t0 = time.perf_counter()
    (_pr, fr1, fr2, _perm0, _lab, fo1, fo2, fn_) = relabel_workload(
        store.n_reads, packed_np, *[np.asarray(x) for x in full_arrays])
    packed_relab = _pr
    s0f = ((len(fr1) - total) // 2 // TILE) * TILE
    nr1, nr2, o1p, o2p, np_ = (x[s0f:s0f + total]
                               for x in (fr1, fr2, fo1, fo2, fn_))
    print(f"relabel prep (full graph): {time.perf_counter() - t0:.2f}s",
          flush=True)
    lines2_np, _ = FK.pack_lines(packed_relab)
    lines2 = jax.device_put(lines2_np)
    datp = [jax.device_put(np.ascontiguousarray(x).astype(np.int32))
            for x in (nr1, nr2, o1p, o2p, np_)]
    nr1d, nr2d, o1pd, o2pd, npd = datp

    def f_both(r1, rows2, o1, o2, n):
        return verify_windows_fused_mxu_both(lines2, r1, rows2, o1, o2, n,
                                             n_words=n_words)

    @jax.jit
    def bench_both(iters):
        def body(i, acc):
            sh = (i % 4) * 1024
            r1x, r2x, o1x, o2x, nx = (
                jnp.roll(x, sh) for x in (nr1d, nr2d, o1pd, o2pd, npd))
            ok = f_both(r1x, r2x, o1x, o2x, nx)
            return acc + ok.sum(dtype=jnp.int64)
        return lax.fori_loop(0, iters, body, jnp.int64(0))

    # correctness: elementwise against the gather-path kernel over the
    # SAME relabeled pairs (the relabeled slice holds different pairs
    # than the original slice, so sums aren't comparable across preps)
    ok_want = np.asarray(verify_windows_fused(
        jax.device_put(packed_relab), nr1d, nr2d, o1pd, o2pd, npd,
        n_words=n_words))
    ok_got = np.asarray(f_both(nr1d, nr2d, o1pd, o2pd, npd))
    tag = (" check=OK" if (ok_want == ok_got).all()
           else f" check=MISMATCH({int((ok_want != ok_got).sum())} pairs)")

    int(bench_both(jnp.asarray(2, jnp.int32)))
    t0 = time.perf_counter()
    int(bench_both(jnp.asarray(10, jnp.int32)))
    cal = (time.perf_counter() - t0) / 10
    iters = max(int(6.0 / max(cal, 1e-9)), 20)
    t0 = time.perf_counter()
    int(bench_both(jnp.asarray(iters, jnp.int32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{'both':10s} {total / dt:.3e} pairs/s{tag}", flush=True)

    # 16-word int8 variant
    from disco_tpu.overlap.fused_kernel import (
        pack_lines16, verify_windows_fused_mxu_both16)
    lines16_np, _ = pack_lines16(packed_relab)
    lines16 = jax.device_put(lines16_np)

    def f_both16(r1, rows2, o1, o2, n):
        return verify_windows_fused_mxu_both16(lines16, r1, rows2, o1, o2,
                                               n, n_words=n_words)

    @jax.jit
    def bench_both16(iters):
        def body(i, acc):
            sh = (i % 4) * 1024
            r1x, r2x, o1x, o2x, nx = (
                jnp.roll(x, sh) for x in (nr1d, nr2d, o1pd, o2pd, npd))
            ok = f_both16(r1x, r2x, o1x, o2x, nx)
            return acc + ok.sum(dtype=jnp.int64)
        return lax.fori_loop(0, iters, body, jnp.int64(0))

    ok_got16 = np.asarray(f_both16(nr1d, nr2d, o1pd, o2pd, npd))
    tag = (" check=OK" if (ok_want == ok_got16).all()
           else f" check=MISMATCH({int((ok_want != ok_got16).sum())} pairs)")
    int(bench_both16(jnp.asarray(2, jnp.int32)))
    t0 = time.perf_counter()
    int(bench_both16(jnp.asarray(10, jnp.int32)))
    cal = (time.perf_counter() - t0) / 10
    iters = max(int(6.0 / max(cal, 1e-9)), 20)
    t0 = time.perf_counter()
    int(bench_both16(jnp.asarray(iters, jnp.int32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{'both16':10s} {total / dt:.3e} pairs/s{tag}", flush=True)


if __name__ == "__main__":
    main()
