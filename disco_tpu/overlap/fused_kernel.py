"""Fused Pallas TPU verification kernel: align + funnel + compare in one
VMEM-resident pass.

Round-3 measurement showed the XLA verify path is align-ISSUE bound, not
gather bound: the log-step roll alignment (`overlap/verify.py::align_window`)
lowers to ~20 relayout passes over padded (P, W+1) intermediates, pinning the
path at ~1.5e7 pairs/s while the whole-row gather alone sustains ~3.2e8
rows/s.  This kernel keeps the row gather in XLA (its TPU lowering is
memory-bound-optimal) and fuses EVERYTHING after it — per-pair word-offset
alignment, bit funnel, masked XOR compare, and the AND-reduction over words —
into a single Pallas pass with no HBM intermediates.

Layout: candidate pairs ride the lane axis, packed words the sublane axis,
so all per-pair quantities broadcast along sublanes and the alignment rolls
are static sublane shifts selected per lane (log-step).  Arrays are plain 2D
(Wp, P) so Pallas blocks slice lanes directly — no 3D relayout, no transpose
inside the kernel.

Replaces (as the production path) the reference's byte-wise substring
compares: src/BuildGraph/src/OverlapGraph.cpp:534,549,581,593.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # pairs per grid step (lanes)


def _roll_up(x, s):
    """Static left-roll of the word (sublane) axis by s, zero-filling: word
    row w takes row w+s's value.  Zero fill (not wrap) matches
    verify.align_window's zero successor semantics."""
    if s == 0:
        return x
    z = jnp.zeros((s,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[s:], z], axis=0)


def _align(x, d, bit, wp):
    """Per-lane align: roll lane p's column up by d[p] words (log-step
    masked static rolls), then funnel-shift left by bit[p] (2*base phase)
    bits using the successor word.  x: (wp, T) uint32; d: (1, T) int32;
    bit: (1, T) uint32."""
    b = 0
    while (1 << b) < wp:
        sel = ((d >> b) & 1) == 1  # (1, T) broadcasts over sublanes
        x = jnp.where(sel, _roll_up(x, 1 << b), x)
        b += 1
    nxt = _roll_up(x, 1)
    lo = (nxt >> (jnp.uint32(31) - bit)) >> jnp.uint32(1)
    return jnp.where(bit == 0, x, (x << bit) | lo)


def _split_off(o_ref):
    """Derive (word shift, uint32 bit phase) from a (1, T) base-offset
    block — in-kernel, so the host side ships raw offsets and no separate
    d/bit passes or scalar-stack materialization run in XLA.  The shift
    forms replicate Python floor-division semantics for any negative
    offsets on invalid (masked-off) lanes."""
    o = o_ref[...]
    d = o >> jnp.int32(4)                      # o // 16
    bit = pltpu.bitcast((o & jnp.int32(15)) << jnp.int32(1), jnp.uint32)
    return d, bit


def _fused_kernel(a_ref, b_ref, o1_ref, o2_ref, n_ref, out_ref):
    """Blocks: a/b (wp, TILE) uint32 unaligned row columns; o1/o2/n
    (1, TILE) int32 raw window offsets/lengths; out (1, TILE) int32 hit
    mask."""
    wp = a_ref.shape[0]
    d1, bit1 = _split_off(o1_ref)
    d2, bit2 = _split_off(o2_ref)
    n = n_ref[...]
    a = _align(a_ref[:], d1, bit1, wp)
    b = _align(b_ref[:], d2, bit2, wp)
    # masked compare over every word row at once; word index = sublane id
    out_ref[:] = _masked_cmp(a, b, n, wp, a.shape[1])


def _masked_cmp(a, b, n, wp, width):
    i32, u32 = jnp.int32, jnp.uint32
    full = u32(0xFFFFFFFF)
    wi = jax.lax.broadcasted_iota(i32, (wp, width), dimension=0)
    rem = n - i32(16) * wi
    shift = pltpu.bitcast(
        i32(2) * (i32(16) - jnp.clip(rem, i32(1), i32(16))), u32)
    mask = jnp.where(rem >= i32(16), full,
                     jnp.where(rem <= i32(0), u32(0), full << shift))
    okw = jnp.where(((a ^ b) & mask) == u32(0), i32(1), i32(0))
    return jnp.min(okw, axis=0, keepdims=True)


def _dual_kernel(a_ref, b_ref, eo1_ref, eo2_ref, en_ref,
                 co1_ref, cn_ref, out_ref):
    """Both overlap checks for one candidate batch in one VMEM pass: the
    suffix-prefix EDGE window (a@e_o1 vs b@e_o2, length ne) and the
    CONTAINMENT window (a@c_o1 vs b@0, length nc — read2's whole string,
    so b needs no alignment).  Blocks: a/b (wp, TILE) uint32; per-window
    offsets/lengths as (1, TILE) int32 blocks; out (2, TILE) int32
    [edge_ok, cont_ok]."""
    wp = a_ref.shape[0]
    a = a_ref[:]
    b = b_ref[:]
    d1e, b1e = _split_off(eo1_ref)
    d2e, b2e = _split_off(eo2_ref)
    ne = en_ref[...]
    d1c, b1c = _split_off(co1_ref)
    nc = cn_ref[...]
    width = a.shape[1]
    oke = _masked_cmp(_align(a, d1e, b1e, wp), _align(b, d2e, b2e, wp),
                      ne, wp, width)
    okc = _masked_cmp(_align(a, d1c, b1c, wp), b, nc, wp, width)
    out_ref[:] = jnp.concatenate([oke, okc], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_compare_dual(a, b, e_o1, e_o2, e_n, c_o1, c_n, *, interpret=False):
    """a, b: (Wp, P) uint32 unaligned row columns; e_*/c_*: (P,) int32
    window geometry (lengths 0 => True).  Returns (edge_ok, cont_ok)
    bool (P,) each."""
    wp, p = a.shape
    assert p % TILE == 0, p

    def _data(i):
        return (jnp.int32(0), i)

    row = pl.BlockSpec((1, TILE), _data, memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM)

    def v(x):
        return x.astype(jnp.int32).reshape(1, p)

    out = pl.pallas_call(
        _dual_kernel,
        out_shape=jax.ShapeDtypeStruct((2, p), jnp.int32),
        grid=(p // TILE,),
        in_specs=[blk, blk, row, row, row, row, row],
        out_specs=pl.BlockSpec((2, TILE), _data, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, v(e_o1), v(e_o2), v(e_n), v(c_o1), v(c_n))
    return out[0].astype(jnp.bool_), out[1].astype(jnp.bool_)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_compare(a, b, o1, o2, n, *, interpret=False):
    """a, b: (Wp, P) uint32 unaligned row columns (pair p's packed row in
    column p); o1/o2: (P,) int32 base offsets of each window start;
    n: (P,) int32 window base lengths (0 => True).  P must be a multiple of
    TILE.  Returns (P,) bool.  Offset->word/bit derivation happens inside
    the kernel (no XLA scalar passes)."""
    wp, p = a.shape
    assert p % TILE == 0, p

    def _data(i):
        return (jnp.int32(0), i)

    row = pl.BlockSpec((1, TILE), _data, memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM)

    def v(x):
        return x.astype(jnp.int32).reshape(1, p)

    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.int32),
        grid=(p // TILE,),
        in_specs=[blk, blk, row, row, row],
        out_specs=pl.BlockSpec((1, TILE), _data, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, v(o1), v(o2), v(n))
    return out.reshape(p).astype(jnp.bool_)


def _pad_pairs(arrs, p):
    pad = (-p) % TILE
    if pad == 0:
        return arrs, p
    out = []
    for x in arrs:
        z = jnp.zeros((pad,), x.dtype)
        out.append(jnp.concatenate([x.astype(jnp.int32) if x.dtype != z.dtype
                                    else x, z]))
    return out, p + pad


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused(packed_all, rows1, rows2, o1, o2, n, *, n_words,
                         interpret=False):
    """Drop-in replacement for verify.verify_windows: two XLA whole-row
    gathers + one fused Pallas align/compare pass.  packed_all: (2N, W+1)
    uint32; rows1/rows2/o1/o2/n: (P,).  Returns (P,) bool."""
    p = rows1.shape[0]
    (rows1, rows2, o1, o2, n), pp = _pad_pairs(
        [rows1.astype(jnp.int32), rows2.astype(jnp.int32),
         o1.astype(jnp.int32), o2.astype(jnp.int32), n.astype(jnp.int32)], p)
    a = packed_all[rows1].T  # (Wp, P): gather then one relayout pass
    b = packed_all[rows2].T
    ok = fused_compare(a, b, o1, o2, n, interpret=interpret)
    return ok[:p]


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused_t(packed_all_t, rows1, rows2, o1, o2, n, *, n_words,
                           interpret=False):
    """Variant fed by the TRANSPOSED read store packed_all_t (W+1, 2N):
    the row fetch becomes a minor-axis (lane) gather producing (Wp, P)
    directly — no relayout pass after the gather.  Which preamble wins is
    chip-dependent; tools/bench_verify_paths.py measures both."""
    p = rows1.shape[0]
    (rows1, rows2, o1, o2, n), pp = _pad_pairs(
        [rows1.astype(jnp.int32), rows2.astype(jnp.int32),
         o1.astype(jnp.int32), o2.astype(jnp.int32), n.astype(jnp.int32)], p)
    a = jnp.take(packed_all_t, rows1, axis=1)
    b = jnp.take(packed_all_t, rows2, axis=1)
    ok = fused_compare(a, b, o1, o2, n, interpret=interpret)
    return ok[:p]


# ---------------------------------------------------------------------------
# MXU-fetch variant: the r1 side of the verify batch arrives SORTED (window
# scan order), so each TILE's rows live in a short contiguous slice of the
# packed table.  Instead of a per-pair row gather, the kernel DMAs the
# slice (as 128-lane LINES of 4 rows x 32 words) into VMEM and expands
# per-lane rows with one-hot MXU matmuls — measured 4.9x the gather on the
# fetch alone (tools/exp_mxu_fetch.py).  The random r2 side keeps the XLA
# gather.  Requires rows1 sorted and per-tile spans < SPAN_ROWS; the
# wrapper asserts outside jit.
# ---------------------------------------------------------------------------
W32 = 32          # padded words per row (128-lane line = 4 rows)
K_LINES = 16      # lines DMA'd per tile
SPAN_ROWS = K_LINES * 4 - 4


def _mxu_kernel(blines_ref, rl_ref, o1_ref, o2_ref, n_ref, b_ref, hbm_ref,
                out_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(blines_ref[t], K_LINES), :], scratch, sem)
    cp.start()
    cp.wait()
    rl = rl_ref[...]                       # (1, T) row offset within slice
    line = rl >> jnp.int32(2)
    phase = rl & jnp.int32(3)
    width = rl.shape[1]
    lio = jax.lax.broadcasted_iota(jnp.int32, (K_LINES, width), 0)
    hp = jax.lax.Precision.HIGHEST
    dn = (((0,), (0,)), ((), ()))
    a_hi = jnp.zeros((W32, width), jnp.float32)
    a_lo = jnp.zeros((W32, width), jnp.float32)
    for q in range(4):
        # Mosaic has no u32<->f32 casts: route via int32 (16-bit values)
        seg = scratch[:, q * W32:(q + 1) * W32]
        hi = pltpu.bitcast(seg >> jnp.uint32(16),
                           jnp.int32).astype(jnp.float32)
        lo = pltpu.bitcast(seg & jnp.uint32(0xFFFF),
                           jnp.int32).astype(jnp.float32)
        oh = jnp.where((lio == line) & (phase == jnp.int32(q)),
                       jnp.float32(1), jnp.float32(0))
        a_hi += jax.lax.dot_general(hi, oh, dn, precision=hp,
                                    preferred_element_type=jnp.float32)
        a_lo += jax.lax.dot_general(lo, oh, dn, precision=hp,
                                    preferred_element_type=jnp.float32)
    a = ((pltpu.bitcast(a_hi.astype(jnp.int32), jnp.uint32) << jnp.uint32(16))
         | pltpu.bitcast(a_lo.astype(jnp.int32), jnp.uint32))
    d1, bit1 = _split_off(o1_ref)
    d2, bit2 = _split_off(o2_ref)
    n = n_ref[...]
    aa = _align(a, d1, bit1, W32)
    bb = _align(b_ref[:], d2, bit2, W32)
    out_ref[:] = _masked_cmp(aa, bb, n, W32, width)


def pack_lines(packed_all):
    """Host-side layout for the MXU-fetch path: rows padded to 32 words,
    row count padded to a multiple of 4 (+ slice headroom), viewed as
    128-lane lines of 4 rows.  Returns (lines (L, 128) uint32, n_rows)."""
    import numpy as np
    pa = np.asarray(packed_all)
    nr, wp = pa.shape
    out = np.zeros((nr + (-nr) % 4 + K_LINES * 4, W32), np.uint32)
    out[:nr, :wp] = pa
    return np.ascontiguousarray(out.reshape(-1, 128)), nr


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused_mxu(packed_lines, rows1, rows2, o1, o2, n, *,
                             n_words, interpret=False):
    """verify_windows over the line-packed table: sorted rows1 fetched by
    per-tile DMA + one-hot MXU expansion inside the kernel; rows2 by XLA
    gather.  rows1 MUST be sorted with per-tile spans < SPAN_ROWS (the
    window scan emits candidates r1-sorted; bench asserts)."""
    p = rows1.shape[0]
    pad = (-p) % TILE
    if pad:
        # pad rows with the LAST row (keeps tile spans tiny); offsets 0
        rows1 = jnp.concatenate(
            [rows1.astype(jnp.int32),
             jnp.broadcast_to(rows1[-1].astype(jnp.int32), (pad,))])
        rows2 = jnp.concatenate(
            [rows2.astype(jnp.int32),
             jnp.broadcast_to(rows2[-1].astype(jnp.int32), (pad,))])
        z = jnp.zeros(pad, jnp.int32)
        o1 = jnp.concatenate([o1.astype(jnp.int32), z])
        o2 = jnp.concatenate([o2.astype(jnp.int32), z])
        n = jnp.concatenate([n.astype(jnp.int32), z])
    pp = p + pad
    nt = pp // TILE
    if isinstance(packed_lines, (tuple, list)):
        # (lines, original table): gather b's random rows from the COMPACT
        # 17-word table (47% less gather traffic than 32-word rows) and
        # zero-pad the word axis up to W32 in one cheap pass
        packed_lines, packed_orig = packed_lines
        b17 = packed_orig[rows2.astype(jnp.int32)].T     # (Wp, pp)
        b = jnp.concatenate(
            [b17, jnp.zeros((W32 - b17.shape[0], pp), jnp.uint32)], axis=0)
    else:
        packed32 = packed_lines.reshape(-1, W32)
        b = packed32[rows2.astype(jnp.int32)].T   # (W32, pp)
    r1t = rows1.astype(jnp.int32).reshape(nt, TILE)
    base_rows = r1t[:, 0] & ~jnp.int32(3)          # line-aligned base
    blines = base_rows >> jnp.int32(2)
    rl = (r1t - base_rows[:, None]).reshape(1, pp)

    def _row(i, *_):
        return (jnp.int32(0), i)

    def _blk(i, *_):
        return (jnp.int32(0), i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((W32, TILE), _blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE), _row, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K_LINES, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        _mxu_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
        interpret=interpret,
    )(blines, rl, o1.astype(jnp.int32).reshape(1, pp),
      o2.astype(jnp.int32).reshape(1, pp),
      n.astype(jnp.int32).reshape(1, pp), b, packed_lines)
    return out.reshape(pp).astype(jnp.bool_)[:p]
