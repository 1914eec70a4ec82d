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
# packed table.  Instead of a per-pair row gather, the kernel pulls the
# slice (as 128-lane LINES of 4 rows x 32 words) into VMEM and expands
# per-lane rows with one-hot MXU matmuls — measured 4.9x the gather on the
# fetch alone (tools/exp_mxu_fetch.py).  The random r2 side keeps the XLA
# gather.
#
# Round-5 rework: the slice fetch rides the grid pipeline itself — the
# line blocks are inputs whose index map reads a scalar-prefetched
# per-tile block index, so Pallas double-buffers the DMA against compute
# (the round-4 kernel issued a synchronous make_async_copy at tile start
# and stalled ~the full HBM latency per tile; the fetch measured
# DMA-latency-bound at 3.55e8 rows/s).  Two adjacent 16-line blocks cover
# a 64-row-aligned 128-row window, so the usable per-tile span is
# SPAN_ROWS = 64 regardless of where the tile's first row falls.
# Preconditions are now checked IN-GRAPH and the kernel falls back to the
# gather path (fused_compare) via lax.cond when violated — callers can no
# longer get silently wrong one-hots.
# ---------------------------------------------------------------------------
W32 = 32          # padded words per row (128-lane line = 4 rows)
B_LINES = 16      # lines per pipelined block (two blocks cover 128 rows)
K_LINES = 16      # retained for pack_lines padding
SPAN_ROWS = 64    # usable per-tile row span (128-row window, 64-row align)


def _expand_rows(s_lo, s_hi, rl, width):
    """One-hot MXU expansion: per-lane row select from two stacked line
    blocks.  s_lo/s_hi: (B_LINES, 128) uint32 line blocks (4 rows x 32
    words per line); rl: (1, width) int32 row offset within the 128-row
    window.  Returns (W32, width) uint32 rows.  Exact: u32 words split in
    16-bit halves (f32-representable), each output element sums exactly
    one nonzero product (one-hot), HIGHEST-precision matmuls."""
    lines = jnp.concatenate([s_lo, s_hi], axis=0)   # (2B, 128)
    nl = 2 * B_LINES
    line = rl >> jnp.int32(2)
    phase = rl & jnp.int32(3)
    lio = jax.lax.broadcasted_iota(jnp.int32, (nl, width), 0)
    hp = jax.lax.Precision.HIGHEST
    dn = (((0,), (0,)), ((), ()))
    a_hi = jnp.zeros((W32, width), jnp.float32)
    a_lo = jnp.zeros((W32, width), jnp.float32)
    for q in range(4):
        # Mosaic has no u32<->f32 casts: route via int32 (16-bit values)
        seg = lines[:, q * W32:(q + 1) * W32]
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
    return ((pltpu.bitcast(a_hi.astype(jnp.int32), jnp.uint32)
             << jnp.uint32(16))
            | pltpu.bitcast(a_lo.astype(jnp.int32), jnp.uint32))


def _mxu2_kernel(ablk_ref, s_lo_ref, s_hi_ref, rl_ref, o1_ref, o2_ref,
                 n_ref, b_ref, out_ref):
    """Pipelined MXU-fetch verify: the line blocks s_lo/s_hi arrive as
    grid-pipelined inputs (index-mapped by the scalar-prefetched per-tile
    block index), so their HBM->VMEM DMA is double-buffered against
    compute by Pallas itself."""
    width = rl_ref.shape[1]
    a = _expand_rows(s_lo_ref[:], s_hi_ref[:], rl_ref[...], width)
    d1, bit1 = _split_off(o1_ref)
    d2, bit2 = _split_off(o2_ref)
    aa = _align(a, d1, bit1, W32)
    bb = _align(b_ref[:], d2, bit2, W32)
    out_ref[:] = _masked_cmp(aa, bb, n_ref[...], W32, width)


def _mxu2_dual_kernel(ablk_ref, s_lo_ref, s_hi_ref, rl_ref, eo1_ref,
                      eo2_ref, en_ref, co1_ref, cn_ref, b_ref, out_ref):
    """Dual (edge + containment) variant of _mxu2_kernel: one r1 fetch,
    both window checks (the containment window compares against read2's
    whole string, so b needs no alignment)."""
    width = rl_ref.shape[1]
    a = _expand_rows(s_lo_ref[:], s_hi_ref[:], rl_ref[...], width)
    b = b_ref[:]
    d1e, b1e = _split_off(eo1_ref)
    d2e, b2e = _split_off(eo2_ref)
    d1c, b1c = _split_off(co1_ref)
    oke = _masked_cmp(_align(a, d1e, b1e, W32), _align(b, d2e, b2e, W32),
                      en_ref[...], W32, width)
    okc = _masked_cmp(_align(a, d1c, b1c, W32), b, cn_ref[...], W32, width)
    out_ref[:] = jnp.concatenate([oke, okc], axis=0)


def pack_lines(packed_all):
    """Host-side layout for the MXU-fetch path: rows padded to 32 words,
    row count padded to a multiple of 64 plus a 128-row headroom block
    (the pipelined fetch reads two adjacent 16-line = 64-row blocks),
    viewed as 128-lane lines of 4 rows.  Returns (lines (L, 128) uint32,
    n_rows)."""
    import numpy as np
    pa = np.asarray(packed_all)
    nr, wp = pa.shape
    nrp = nr + (-nr) % 64 + 64 * max(NB_B, 2)  # headroom for widest window
    out = np.zeros((nrp, W32), np.uint32)
    out[:nr, :wp] = pa
    return np.ascontiguousarray(out.reshape(-1, 128)), nr


def _mxu_prep(rows1, pp):
    """Shared in-graph prep for the MXU-fetch kernels: per-tile aligned
    block index + within-window row offsets + the validity flag (sorted
    spans within the 128-row window).  rows1: (pp,) int32."""
    nt = pp // TILE
    r1t = rows1.reshape(nt, TILE)
    base = (r1t[:, 0] >> jnp.int32(6)) << jnp.int32(6)   # 64-row aligned
    ablk = base >> jnp.int32(6)                          # 16-line blocks
    rl = r1t - base[:, None]
    ok = jnp.all((rl >= 0) & (rl < 128))
    return ablk.astype(jnp.int32), rl.reshape(1, pp), ok


def _row_spec(n=1):
    def _ix(i, *_):
        return (jnp.int32(0), i)
    return pl.BlockSpec((n, TILE), _ix, memory_space=pltpu.VMEM)


def _line_specs():
    # index maps must stay int32 end-to-end: Mosaic rejects i64 block
    # indices under jax_enable_x64 (weak-int64 literals poison the map)
    def _lo(i, ablk):
        return (ablk[i], jnp.int32(0))

    def _hi(i, ablk):
        return (ablk[i] + jnp.int32(1), jnp.int32(0))
    return [pl.BlockSpec((B_LINES, 128), _lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_LINES, 128), _hi, memory_space=pltpu.VMEM)]


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused_mxu(packed_lines, rows1, rows2, o1, o2, n, *,
                             n_words, interpret=False):
    """verify_windows over the line-packed table: sorted rows1 fetched by
    pipelined line-block DMA + one-hot MXU expansion inside the kernel;
    rows2 by XLA gather.  The rows1 sorted/span precondition is checked
    IN-GRAPH; violating batches fall back to the gather-both-sides path
    (fused_compare) via lax.cond, so callers can never get silently wrong
    verdicts.  Empty input returns an empty mask."""
    p = rows1.shape[0]
    if p == 0:
        return jnp.zeros((0,), jnp.bool_)
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
    rows1 = rows1.astype(jnp.int32)
    ablk, rl, ok = _mxu_prep(rows1, pp)
    o1 = o1.astype(jnp.int32).reshape(1, pp)
    o2 = o2.astype(jnp.int32).reshape(1, pp)
    nn = n.astype(jnp.int32).reshape(1, pp)

    def _mxu_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pp // TILE,),
            in_specs=_line_specs() + [_row_spec()] * 4
            + [pl.BlockSpec((W32, TILE), lambda i, *_: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)],
            out_specs=_row_spec(),
        )
        return pl.pallas_call(
            _mxu2_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
            interpret=interpret,
        )(jnp.clip(ablk, 0, packed_lines.shape[0] // B_LINES - 2),
          packed_lines, packed_lines, rl, o1, o2, nn, b)

    def _gather_path(_):
        packed32 = packed_lines.reshape(-1, W32)
        a = packed32[rows1].T
        return fused_compare(a, b, o1.reshape(pp), o2.reshape(pp),
                             nn.reshape(pp),
                             interpret=interpret).astype(jnp.int32
                                                         ).reshape(1, pp)

    out = jax.lax.cond(ok, _mxu_path, _gather_path, operand=None)
    return out.reshape(pp).astype(jnp.bool_)[:p]


# ---------------------------------------------------------------------------
# Both-sides in-kernel fetch (round 5): when reads are RENUMBERED by an
# overlap-locality layout (BFS over the candidate graph — overlapping
# reads are genome neighbors, so their labels become adjacent;
# tools/exp_locality.py measures r2 tile spans collapsing from ~80k rows
# to <300), the r2 side ALSO falls in a small per-tile window, and the
# latency-bound XLA row gather (the measured wall: ~80% of the verify
# time) disappears entirely.  Both rows are expanded from pipelined line
# blocks by one-hot matmuls:
#   - byte-split bf16 (values <=255 are exact in bf16; each output sums
#     exactly one nonzero product) — 4 single-pass matmuls instead of the
#     hi/lo f32 HIGHEST split's 2x~6 passes;
#   - ONE (S_lines, 128)-wide matmul per byte plane computes all 4 row
#     phases at once; the per-lane phase is selected on the OUTPUT with 4
#     masked adds, so no per-phase one-hots are built.
# Compare width is W_CMP=24 words (reads <= 256 bp), cutting align/cmp
# VPU work 25% vs the 32-word kernels.
# ---------------------------------------------------------------------------
W_CMP = 24        # compare/align sublanes (words); supports n_words <= 16
NB_A = 3          # 16-line blocks per a-side window (192 rows, budget 129)
NB_B = 6          # 16-line blocks per b-side window (384 rows, budget 321)


def _expand_rows_bs(blocks, rl, width):
    """Byte-split bf16 one-hot expansion with output-side phase select.
    blocks: (S_lines, 128) uint32 line window; rl: (1, width) int32 row
    offset within the window (4 rows/line).  Returns (W_CMP, width)
    uint32 rows — exact (one nonzero product per output element)."""
    s_l = blocks.shape[0]
    line = rl >> jnp.int32(2)
    phase = rl & jnp.int32(3)
    lio = jax.lax.broadcasted_iota(jnp.int32, (s_l, width), 0)
    # arithmetic one-hot (max(1-|d|, 0)): Mosaic mis-relayouts a 2D i1
    # eq-mask here when this kernel is compiled standalone
    oh = jnp.maximum(jnp.int32(1) - jnp.abs(lio - line),
                     jnp.int32(0)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    out = jnp.zeros((W_CMP, width), jnp.uint32)
    for byte in range(4):
        plane = pltpu.bitcast(
            (blocks >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF),
            jnp.int32).astype(jnp.bfloat16)
        full = jax.lax.dot_general(plane, oh, dn,
                                   preferred_element_type=jnp.float32)
        sel = jnp.zeros((W_CMP, width), jnp.float32)
        for q in range(4):
            seg = full[q * W32:q * W32 + W_CMP]
            sel += jnp.where(phase == jnp.int32(q), seg, jnp.float32(0))
        out |= (pltpu.bitcast(sel.astype(jnp.int32), jnp.uint32)
                << jnp.uint32(8 * byte))
    return out


def _mxu3_kernel(ablk_ref, bblk_ref, a0, a1, a2, b0, b1, b2, b3, b4, b5,
                 rla_ref, rlb_ref, o1_ref, o2_ref, n_ref, out_ref):
    """Both-sides in-kernel fetch verify (single check)."""
    width = rla_ref.shape[1]
    awin = jnp.concatenate([a0[:], a1[:], a2[:]], axis=0)
    bwin = jnp.concatenate([b0[:], b1[:], b2[:], b3[:], b4[:], b5[:]],
                           axis=0)
    a = _expand_rows_bs(awin, rla_ref[...], width)
    b = _expand_rows_bs(bwin, rlb_ref[...], width)
    d1, bit1 = _split_off(o1_ref)
    d2, bit2 = _split_off(o2_ref)
    aa = _align(a, d1, bit1, W_CMP)
    bb = _align(b, d2, bit2, W_CMP)
    out_ref[:] = _masked_cmp(aa, bb, n_ref[...], W_CMP, width)


def _win_specs(nb, which):
    """nb pipelined line-block specs anchored at the scalar-prefetched
    per-tile base block (which=0 -> first prefetch arg, 1 -> second)."""
    specs = []
    for d in range(nb):
        def _ix(i, s0, s1, _d=d, _w=which):
            base = s0[i] if _w == 0 else s1[i]
            return (base + jnp.int32(_d), jnp.int32(0))
        specs.append(pl.BlockSpec((B_LINES, 128), _ix,
                                  memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused_mxu_both(packed_lines, rows1, rows2, o1, o2, n, *,
                                  n_words, interpret=False):
    """verify_windows with BOTH row fetches inside the kernel.  Requires a
    locality ordering: per tile, rows1 spans < 129 and rows2 spans < 321
    (checked in-graph; violations fall back to the r2-gather kernel).
    rows1/rows2 index the SAME line-packed table (relabeled read rows)."""
    p = rows1.shape[0]
    if p == 0:
        return jnp.zeros((0,), jnp.bool_)
    assert n_words <= W_CMP - 8, n_words  # 24-word align/cmp window
    pad = (-p) % TILE
    if pad:
        rows1, rows2 = (jnp.concatenate(
            [x.astype(jnp.int32), jnp.broadcast_to(x[-1].astype(jnp.int32),
                                                   (pad,))])
            for x in (rows1, rows2))
        z = jnp.zeros(pad, jnp.int32)
        o1, o2, n = (jnp.concatenate([x.astype(jnp.int32), z])
                     for x in (o1, o2, n))
    pp = p + pad
    nt = pp // TILE
    rows1 = rows1.astype(jnp.int32)
    rows2 = rows2.astype(jnp.int32)
    nblk = packed_lines.shape[0] // B_LINES

    def _prep(rows, nb):
        rt = rows.reshape(nt, TILE)
        base = (rt.min(axis=1) >> jnp.int32(6)) << jnp.int32(6)
        blk = jnp.clip(base >> jnp.int32(6), 0, nblk - nb)
        rl = rt - (blk[:, None] << jnp.int32(6))
        ok = jnp.all((rl >= 0) & (rl < nb * 64))
        return blk.astype(jnp.int32), rl.reshape(1, pp), ok

    ablk, rla, ok_a = _prep(rows1, NB_A)
    bblk, rlb, ok_b = _prep(rows2, NB_B)
    o1 = o1.astype(jnp.int32).reshape(1, pp)
    o2 = o2.astype(jnp.int32).reshape(1, pp)
    nn = n.astype(jnp.int32).reshape(1, pp)

    def _both_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=_win_specs(NB_A, 0) + _win_specs(NB_B, 1)
            + [pl.BlockSpec((1, TILE), lambda i, *_: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec((1, TILE),
                                   lambda i, *_: (jnp.int32(0), i),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            _mxu3_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
            interpret=interpret,
        )(ablk, bblk, *([packed_lines] * (NB_A + NB_B)), rla, rlb,
          o1, o2, nn)

    def _gather_path(_):
        return verify_windows_fused_mxu(
            packed_lines, rows1, rows2, o1.reshape(pp), o2.reshape(pp),
            nn.reshape(pp), n_words=n_words,
            interpret=interpret).astype(jnp.int32).reshape(1, pp)

    out = jax.lax.cond(ok_a & ok_b, _both_path, _gather_path, operand=None)
    return out.reshape(pp).astype(jnp.bool_)[:p]


# ---------------------------------------------------------------------------
# 16-word variant of the both-sides kernel: reads <= 256 bp only occupy 16
# packed words, so a 128-lane line holds EIGHT rows (vs four 32-word
# slots).  Same row window then needs half the matmul lines — one-hot
# FLOPs halve — and align/compare run at 16 sublanes.  Planes are int8
# (byte - 128, exact with int32 accumulation; +128 restored after the
# select: each output sums exactly one product) for 2x bf16 MXU rate
# where supported.
# ---------------------------------------------------------------------------
W16 = 16
B16_LINES = 8     # lines per pipelined block (64 rows at 8 rows/line)
NB16_A = 4        # a-side window: 256 rows (budget 193 after 64-row align)
NB16_B = 7        # b-side window: 448 rows (budget 385)


def _expand_rows16(blocks, rl, width):
    """One-hot expansion over 16-word rows (8 rows/line), int8 planes.
    blocks: (S_lines, 128) uint32; rl: (1, width) int32 row offset within
    the window.  Returns (W16, width) uint32 rows — exact."""
    s_l = blocks.shape[0]
    line = rl >> jnp.int32(3)
    phase = rl & jnp.int32(7)
    lio = jax.lax.broadcasted_iota(jnp.int32, (s_l, width), 0)
    ohi = jnp.maximum(jnp.int32(1) - jnp.abs(lio - line), jnp.int32(0))
    oh = ohi.astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    out = jnp.zeros((W16, width), jnp.uint32)
    for byte in range(4):
        plane = (pltpu.bitcast(
            (blocks >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF),
            jnp.int32) - jnp.int32(128)).astype(jnp.int8)
        full = jax.lax.dot_general(plane, oh, dn,
                                   preferred_element_type=jnp.int32)
        sel = jnp.zeros((W16, width), jnp.int32)
        for q in range(8):
            seg = full[q * W16:(q + 1) * W16]
            sel += jnp.where(phase == jnp.int32(q), seg, jnp.int32(0))
        out |= (pltpu.bitcast(sel + jnp.int32(128), jnp.uint32)
                << jnp.uint32(8 * byte))
    return out


def _mxu3_16_kernel(ablk_ref, bblk_ref, a0, a1, a2, a3, b0, b1, b2, b3,
                    b4, b5, b6, rla_ref, rlb_ref, o1_ref, o2_ref, n_ref,
                    out_ref):
    width = rla_ref.shape[1]
    awin = jnp.concatenate([a0[:], a1[:], a2[:], a3[:]], axis=0)
    bwin = jnp.concatenate([b0[:], b1[:], b2[:], b3[:], b4[:], b5[:],
                            b6[:]], axis=0)
    a = _expand_rows16(awin, rla_ref[...], width)
    b = _expand_rows16(bwin, rlb_ref[...], width)
    d1, bit1 = _split_off(o1_ref)
    d2, bit2 = _split_off(o2_ref)
    aa = _align(a, d1, bit1, W16)
    bb = _align(b, d2, bit2, W16)
    out_ref[:] = _masked_cmp(aa, bb, n_ref[...], W16, width)


def pack_lines16(packed_all):
    """16-word line layout: rows truncated/padded to 16 words (valid for
    reads <= 256 bp — word 16 of packed_all is always the zero funnel
    pad), 8 rows per 128-lane line.  Returns (lines (L, 128) uint32,
    n_rows)."""
    import numpy as np
    pa = np.asarray(packed_all)
    nr, wp = pa.shape
    assert wp <= W16 + 1, wp
    nrp = nr + (-nr) % 64 + 64 * NB16_B
    out = np.zeros((nrp, W16), np.uint32)
    out[:nr, :min(wp, W16)] = pa[:, :W16]
    return np.ascontiguousarray(out.reshape(-1, 128)), nr


def _win_specs16(nb, which):
    specs = []
    for d in range(nb):
        def _ix(i, s0, s1, _d=d, _w=which):
            base = s0[i] if _w == 0 else s1[i]
            return (base + jnp.int32(_d), jnp.int32(0))
        specs.append(pl.BlockSpec((B16_LINES, 128), _ix,
                                  memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def verify_windows_fused_mxu_both16(packed_lines16, rows1, rows2, o1, o2,
                                    n, *, n_words, interpret=False):
    """16-word both-sides-fetch verify (reads <= 256 bp).  Same contract
    as verify_windows_fused_mxu_both; the in-graph fallback gathers from
    the 16-word table."""
    p = rows1.shape[0]
    if p == 0:
        return jnp.zeros((0,), jnp.bool_)
    assert n_words <= W16, n_words
    pad = (-p) % TILE
    if pad:
        rows1, rows2 = (jnp.concatenate(
            [x.astype(jnp.int32), jnp.broadcast_to(x[-1].astype(jnp.int32),
                                                   (pad,))])
            for x in (rows1, rows2))
        z = jnp.zeros(pad, jnp.int32)
        o1, o2, n = (jnp.concatenate([x.astype(jnp.int32), z])
                     for x in (o1, o2, n))
    pp = p + pad
    nt = pp // TILE
    rows1 = rows1.astype(jnp.int32)
    rows2 = rows2.astype(jnp.int32)
    nblk = packed_lines16.shape[0] // B16_LINES

    def _prep(rows, nb):
        rt = rows.reshape(nt, TILE)
        base = (rt.min(axis=1) >> jnp.int32(6)) << jnp.int32(6)
        blk = jnp.clip(base >> jnp.int32(6), 0, nblk - nb)
        rl = rt - (blk[:, None] << jnp.int32(6))
        ok = jnp.all((rl >= 0) & (rl < nb * 64))
        return blk.astype(jnp.int32), rl.reshape(1, pp), ok

    ablk, rla, ok_a = _prep(rows1, NB16_A)
    bblk, rlb, ok_b = _prep(rows2, NB16_B)
    o1 = o1.astype(jnp.int32).reshape(1, pp)
    o2 = o2.astype(jnp.int32).reshape(1, pp)
    nn = n.astype(jnp.int32).reshape(1, pp)

    def _both_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=_win_specs16(NB16_A, 0) + _win_specs16(NB16_B, 1)
            + [pl.BlockSpec((1, TILE), lambda i, *_: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec((1, TILE),
                                   lambda i, *_: (jnp.int32(0), i),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            _mxu3_16_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
            interpret=interpret,
        )(ablk, bblk, *([packed_lines16] * (NB16_A + NB16_B)), rla, rlb,
          o1, o2, nn)

    def _gather_path(_):
        packed16 = packed_lines16.reshape(-1, W16)
        a = packed16[rows1].T
        b = packed16[rows2].T
        return fused_compare(a, b, o1.reshape(pp), o2.reshape(pp),
                             nn.reshape(pp),
                             interpret=interpret).astype(jnp.int32
                                                         ).reshape(1, pp)

    out = jax.lax.cond(ok_a & ok_b, _both_path, _gather_path, operand=None)
    return out.reshape(pp).astype(jnp.bool_)[:p]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_compare_dual_mxu(packed_lines, b, rows1, e_o1, e_o2, e_n, c_o1,
                           c_n, *, interpret=False):
    """Dual-check (edge + containment) over the line-packed table: the
    SORTED rows1 side is fetched in-kernel (pipelined line DMA + one-hot
    MXU expansion); the b side arrives pre-gathered as (W32, P) columns.
    The sorted/span precondition is checked in-graph with a lax.cond
    fallback to fused_compare_dual.  P must be a multiple of TILE.
    Returns (edge_ok, cont_ok) bool (P,)."""
    pp = rows1.shape[0]
    assert pp % TILE == 0 and pp > 0, pp
    rows1 = rows1.astype(jnp.int32)
    ablk, rl, ok = _mxu_prep(rows1, pp)

    def v(x):
        return x.astype(jnp.int32).reshape(1, pp)

    def _mxu_path(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pp // TILE,),
            in_specs=_line_specs() + [_row_spec()] * 6
            + [pl.BlockSpec((W32, TILE), lambda i, *_: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, TILE),
                                   lambda i, *_: (jnp.int32(0), i),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            _mxu2_dual_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, pp), jnp.int32),
            interpret=interpret,
        )(jnp.clip(ablk, 0, packed_lines.shape[0] // B_LINES - 2),
          packed_lines, packed_lines, rl, v(e_o1), v(e_o2), v(e_n),
          v(c_o1), v(c_n), b)

    def _gather_path(_):
        packed32 = packed_lines.reshape(-1, W32)
        a = packed32[rows1].T
        eo, co = fused_compare_dual(a, b, e_o1, e_o2, e_n, c_o1, c_n,
                                    interpret=interpret)
        return jnp.stack([eo.astype(jnp.int32), co.astype(jnp.int32)])

    out = jax.lax.cond(ok, _mxu_path, _gather_path, operand=None)
    return out[0].astype(jnp.bool_), out[1].astype(jnp.bool_)
