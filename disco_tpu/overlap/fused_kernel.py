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


def _fused_kernel(a_ref, b_ref, s_ref, out_ref):
    """Blocks: a/b (wp, TILE) uint32 unaligned row columns; s (8, TILE)
    int32 scalar rows [d1, bit1, d2, bit2, n, 0, 0, 0]; out (1, TILE) int32
    hit mask."""
    wp = a_ref.shape[0]
    u32 = jnp.uint32
    d1 = s_ref[0:1, :]
    bit1 = pltpu.bitcast(s_ref[1:2, :], u32)
    d2 = s_ref[2:3, :]
    bit2 = pltpu.bitcast(s_ref[3:4, :], u32)
    n = s_ref[4:5, :]

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


def _dual_kernel(a_ref, b_ref, s_ref, out_ref):
    """Both overlap checks for one candidate batch in one VMEM pass: the
    suffix-prefix EDGE window (a@e_o1 vs b@e_o2, length ne) and the
    CONTAINMENT window (a@c_o1 vs b@0, length nc — read2's whole string,
    so b needs no alignment).  Blocks: a/b (wp, TILE) uint32; s (8, TILE)
    int32 rows [d1e, bit1e, d2e, bit2e, ne, d1c, bit1c, nc]; out (2, TILE)
    int32 [edge_ok, cont_ok]."""
    wp = a_ref.shape[0]
    u32 = jnp.uint32
    a = a_ref[:]
    b = b_ref[:]
    d1e = s_ref[0:1, :]
    b1e = pltpu.bitcast(s_ref[1:2, :], u32)
    d2e = s_ref[2:3, :]
    b2e = pltpu.bitcast(s_ref[3:4, :], u32)
    ne = s_ref[4:5, :]
    d1c = s_ref[5:6, :]
    b1c = pltpu.bitcast(s_ref[6:7, :], u32)
    nc = s_ref[7:8, :]
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
    d1e, b1e = _offsets(e_o1)
    d2e, b2e = _offsets(e_o2)
    d1c, b1c = _offsets(c_o1)
    scal = jnp.stack([d1e, b1e, d2e, b2e, e_n.astype(jnp.int32),
                      d1c, b1c, c_n.astype(jnp.int32)]).astype(jnp.int32)

    def _data(i):
        return (jnp.int32(0), i)

    out = pl.pallas_call(
        _dual_kernel,
        out_shape=jax.ShapeDtypeStruct((2, p), jnp.int32),
        grid=(p // TILE,),
        in_specs=[
            pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), _data, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, TILE), _data, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, scal)
    return out[0].astype(jnp.bool_), out[1].astype(jnp.bool_)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_compare(a, b, d1, bit1, d2, bit2, n, *, interpret=False):
    """a, b: (Wp, P) uint32 unaligned row columns (pair p's packed row in
    column p); d*/bit*: (P,) int32 word/bit offsets of each window start;
    n: (P,) int32 window base lengths (0 => True).  P must be a multiple of
    TILE.  Returns (P,) bool."""
    wp, p = a.shape
    assert p % TILE == 0, p
    grid = (p // TILE,)
    zero = jnp.zeros_like(n)
    scal = jnp.stack([d1, bit1, d2, bit2, n, zero, zero, zero]
                     ).astype(jnp.int32)  # (8, P)

    def _data(i):
        return (jnp.int32(0), i)

    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, TILE), _data, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), _data, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), _data, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, scal)
    return out.reshape(p).astype(jnp.bool_)


def _offsets(o):
    o = o.astype(jnp.int32)
    return o // 16, 2 * (o % 16)


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
    d1, bit1 = _offsets(o1)
    d2, bit2 = _offsets(o2)
    ok = fused_compare(a, b, d1, bit1, d2, bit2, n, interpret=interpret)
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
    d1, bit1 = _offsets(o1)
    d2, bit2 = _offsets(o2)
    ok = fused_compare(a, b, d1, bit1, d2, bit2, n, interpret=interpret)
    return ok[:p]
