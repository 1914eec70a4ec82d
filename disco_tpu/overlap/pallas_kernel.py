"""Pallas TPU kernel for the packed-window compare core.

The overlap check after row gathering is: given per-candidate word columns
a[w], b[w] (w = 0..n_words-1, already base-row-aligned by the gather), and
per-candidate bit phases/lengths, compute
    ok[p] = AND_w ((funnel(a,w) ^ funnel(b,w)) & mask(w) == 0)
This is pure VPU work; the kernel runs it in one VMEM pass with a
(words, 128)-lane layout (candidates on lanes, words on sublanes) and no
intermediate HBM traffic.  Gathers stay in XLA — its TPU gather lowering is
already memory-bound-optimal, and per-lane dynamic sublane selects are not
VPU-friendly (guide: pallas_guide.md "Tiling Constraints", "Common
Pitfalls #7").

Reference baseline being replaced: byte-wise std::string::substr compares
(reference: src/BuildGraph/src/OverlapGraph.cpp:534,549,581,593).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8  # pairs processed per grid step = SUB * LANES


def _compare_kernel(a_ref, b_ref, bit1_ref, bit2_ref, n_ref, out_ref):
    """Blocks: a/b (1, W+1, SUB*LANES) uint32 word columns (word w at
    sublane w, row W is the next-word row for the funnel shift),
    bit1/bit2/n (1, SUB, LANES) int32, out (1, SUB, LANES) int32."""
    n_words = a_ref.shape[1] - 1
    full = jnp.uint32(0xFFFFFFFF)
    one = jnp.uint32(1)

    # int32 -> uint32 must be a bitcast: Mosaic has no same-width
    # signed->unsigned convert lowering
    bit1 = pltpu.bitcast(bit1_ref[:], jnp.uint32)
    bit2 = pltpu.bitcast(bit2_ref[:], jnp.uint32)
    n = n_ref[:]
    ok = jnp.ones(n.shape, jnp.int32)
    shape = n.shape

    def window_word(ref, wi, bit):
        w0 = ref[:, wi, :].reshape(shape)
        w1 = ref[:, wi + 1, :].reshape(shape)
        lo = (w1 >> (jnp.uint32(31) - bit)) >> one
        return jnp.where(bit == 0, w0, (w0 << bit) | lo)

    # constants must be explicit int32: with jax_enable_x64 on, weak Python
    # ints in where/clip become int64 and Mosaic's int64->int32
    # convert-element-type lowering recurses infinitely
    i32 = jnp.int32
    for wi in range(n_words):
        rem = n - 16 * wi
        x = window_word(a_ref, wi, bit1)
        y = window_word(b_ref, wi, bit2)
        shift = pltpu.bitcast(
            i32(2) * (i32(16) - jnp.clip(rem, i32(1), i32(16))), jnp.uint32)
        partial = full << shift
        mask = jnp.where(rem >= 16, full,
                         jnp.where(rem <= 0, jnp.uint32(0), partial))
        ok &= jnp.where(((x ^ y) & mask) == 0, i32(1), i32(0))
    out_ref[:] = ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def compare_windows(a, b, bit1, bit2, n, *, interpret=False):
    """a, b: (W+1, P) uint32 word columns; bit1/bit2: (P,) int32 2*bit
    phases; n: (P,) int32 window lengths.  P must be a multiple of
    SUB*LANES.  Returns (P,) bool."""
    w1, p = a.shape
    assert p % (SUB * LANES) == 0
    tiles = p // (SUB * LANES)
    grid = (tiles,)
    b1 = bit1.reshape(tiles, SUB, LANES)
    b2 = bit2.reshape(tiles, SUB, LANES)
    nn = n.reshape(tiles, SUB, LANES)
    # candidate tiles leading so each block's trailing dims are
    # (w1, SUB*LANES): w1 spans the full axis, lanes divisible by 128
    a3 = jnp.transpose(a.reshape(w1, tiles, SUB * LANES), (1, 0, 2))
    b3 = jnp.transpose(b.reshape(w1, tiles, SUB * LANES), (1, 0, 2))

    # index-map literals must be int32: under jax_enable_x64 a weak Python 0
    # traces as i64 and Mosaic rejects the (i32, i64, i64) block-index
    # function with "failed to legalize operation 'func.return'"
    def _imap(i):
        return (i, jnp.int32(0), jnp.int32(0))

    out = pl.pallas_call(
        _compare_kernel,
        out_shape=jax.ShapeDtypeStruct((tiles, SUB, LANES), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, w1, SUB * LANES), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1, SUB * LANES), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), _imap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANES), _imap,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a3, b3, b1, b2, nn)
    return out.reshape(p).astype(jnp.bool_)
