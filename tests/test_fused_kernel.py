"""Fused Pallas verify kernel vs the XLA verify path (interpret mode on the
CPU mesh; the compiled kernel is exercised on hardware by
tools/bench_verify_paths.py)."""
import numpy as np

from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.verify import make_packed_all, verify_windows
from disco_tpu.overlap.fused_kernel import (verify_windows_fused,
                                            verify_windows_fused_t)


def _fixture(seed=0, n_reads=200, P=4096):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), 2000))
    seqs = [genome[s:s + 100] for s in rng.integers(0, 1900, n_reads)]
    store = ReadStore.from_sequences(seqs)
    packed_all = make_packed_all(store.packed, store.packed_rc)
    rows1 = rng.integers(0, n_reads, P).astype(np.int32)
    rows2 = rng.integers(0, 2 * n_reads, P).astype(np.int32)
    o1 = rng.integers(0, 60, P).astype(np.int32)
    o2 = rng.integers(0, 60, P).astype(np.int32)
    n = rng.integers(0, 40, P).astype(np.int32)
    return store, packed_all, rows1, rows2, o1, o2, n


def test_fused_matches_xla_verify():
    store, packed_all, rows1, rows2, o1, o2, n = _fixture()
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    got = np.asarray(verify_windows_fused(
        packed_all, rows1, rows2, o1, o2, n, n_words=store.n_words,
        interpret=True))
    assert (want == got).all()
    # transposed-table preamble variant
    got_t = np.asarray(verify_windows_fused_t(
        np.ascontiguousarray(np.asarray(packed_all).T), rows1, rows2, o1, o2,
        n, n_words=store.n_words, interpret=True))
    assert (want == got_t).all()
    # real-match positives: identical windows must verify
    got2 = np.asarray(verify_windows_fused(
        packed_all, rows1, rows1, o1, o1, n, n_words=store.n_words,
        interpret=True))
    assert got2.all()


def test_dual_kernel_matches_xla_checks():
    """fused_compare_dual (edge + containment in one pass) vs the XLA
    align/compare path used on non-TPU backends (device._dual_check)."""
    import jax.numpy as jnp

    from disco_tpu.overlap.fused_kernel import fused_compare_dual
    from disco_tpu.overlap.verify import _masked_equal, align_window

    store, packed_all, rows1, rows2, e_o1, e_o2, e_n = _fixture(seed=5)
    rng = np.random.default_rng(6)
    P = len(rows1)
    c_o1 = rng.integers(0, 60, P).astype(np.int32)
    c_n = rng.integers(0, 40, P).astype(np.int32)
    blk1 = jnp.asarray(packed_all)[rows1]
    blk2 = jnp.asarray(packed_all)[rows2]

    def xla_check(o1, o2, nl):
        return np.asarray(_masked_equal(
            align_window(blk1, jnp.asarray(o1)),
            align_window(blk2, jnp.asarray(o2)), jnp.asarray(nl),
            store.n_words))

    want_e = xla_check(e_o1, e_o2, e_n)
    want_c = xla_check(c_o1, np.zeros_like(c_o1), c_n)
    got_e, got_c = fused_compare_dual(
        jnp.asarray(blk1).T, jnp.asarray(blk2).T,
        jnp.asarray(e_o1), jnp.asarray(e_o2), jnp.asarray(e_n),
        jnp.asarray(c_o1), jnp.asarray(c_n), interpret=True)
    assert (np.asarray(got_e) == want_e).all()
    assert (np.asarray(got_c) == want_c).all()


def test_fused_non_tile_multiple_and_zero_n():
    """P not a multiple of the kernel tile + n=0 rows come out True."""
    store, packed_all, rows1, rows2, o1, o2, n = _fixture(seed=3, P=1500)
    n[:10] = 0
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    got = np.asarray(verify_windows_fused(
        packed_all, rows1, rows2, o1, o2, n, n_words=store.n_words,
        interpret=True))
    assert (want == got).all()
    assert got[:10].all()


def test_mxu_fetch_variant_matches_on_tpu():
    """verify_windows_fused_mxu (per-tile DMA + one-hot MXU row expansion
    for the sorted r1 side) vs the XLA path.  The kernel's DMA +
    scalar-prefetch pipeline only runs compiled on TPU; skipped on the CPU
    test mesh (bench.py exercises it on hardware)."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("MXU-fetch kernel requires a TPU backend")
    from disco_tpu.overlap.fused_kernel import (pack_lines,
                                                verify_windows_fused_mxu)

    store, packed_all, _r, rows2, o1, o2, n = _fixture(seed=9, P=4096 + 700)
    rng = np.random.default_rng(10)
    rows1 = np.sort(rng.integers(0, 55, len(rows2))).astype(np.int32)
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    lines, _ = pack_lines(packed_all)
    got = np.asarray(verify_windows_fused_mxu(
        jax.device_put(lines), rows1, rows2, o1, o2, n,
        n_words=store.n_words))
    assert (want == got).all()
    got2 = np.asarray(verify_windows_fused_mxu(
        (jax.device_put(lines), jax.device_put(np.asarray(packed_all))),
        rows1, rows2, o1, o2, n, n_words=store.n_words))
    assert (want == got2).all()


def test_mxu_fetch_variant_interpret():
    """Same MXU-fetch equivalence in Pallas interpret mode, so the DMA +
    scalar-prefetch + one-hot-matmul kernel is covered on the CPU suite
    (the compiled kernel is exercised on hardware by bench.py and the
    TPU-gated test above)."""
    from disco_tpu.overlap.fused_kernel import (pack_lines,
                                                verify_windows_fused_mxu)

    store, packed_all, _r, rows2, o1, o2, n = _fixture(seed=9, P=2048 + 300)
    rng = np.random.default_rng(10)
    rows1 = np.sort(rng.integers(0, 55, len(rows2))).astype(np.int32)
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    lines, _ = pack_lines(packed_all)
    got = np.asarray(verify_windows_fused_mxu(
        lines, rows1, rows2, o1, o2, n, n_words=store.n_words,
        interpret=True))
    assert (want == got).all()
    got2 = np.asarray(verify_windows_fused_mxu(
        (lines, np.asarray(packed_all)), rows1, rows2, o1, o2, n,
        n_words=store.n_words, interpret=True))
    assert (want == got2).all()


def test_mxu_fetch_guard_falls_back_in_graph():
    """Unsorted / wide-span rows1 must trip the IN-GRAPH precondition and
    produce correct output via the lax.cond gather fallback (round-5: the
    wrapper can no longer return silently wrong one-hots)."""
    store, packed_all, _r, rows2, o1, o2, n = _fixture(seed=11, P=2048)
    rng = np.random.default_rng(12)
    rows1 = rng.integers(0, 2 * 200, len(rows2)).astype(np.int32)  # random
    from disco_tpu.overlap.fused_kernel import (pack_lines,
                                                verify_windows_fused_mxu)
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    lines, _ = pack_lines(packed_all)
    got = np.asarray(verify_windows_fused_mxu(
        (lines, np.asarray(packed_all)), rows1, rows2, o1, o2, n,
        n_words=store.n_words, interpret=True))
    assert (want == got).all()


def test_mxu_fetch_empty_input():
    from disco_tpu.overlap.fused_kernel import (pack_lines,
                                                verify_windows_fused_mxu)
    store, packed_all, *_ = _fixture(seed=13, P=1024)
    lines, _ = pack_lines(packed_all)
    z = np.zeros(0, np.int32)
    got = verify_windows_fused_mxu(lines, z, z, z, z, z,
                                   n_words=store.n_words, interpret=True)
    assert got.shape == (0,)


def test_dual_mxu_matches_dual_gather():
    """fused_compare_dual_mxu (production candidate_checks path) vs
    fused_compare_dual on sorted rows1, plus the in-graph fallback on
    random rows1 — all in interpret mode."""
    import jax.numpy as jnp

    from disco_tpu.overlap.fused_kernel import (
        TILE, W32, fused_compare_dual, fused_compare_dual_mxu, pack_lines)

    store, packed_all, _r, rows2, e_o1, e_o2, e_n = _fixture(seed=21,
                                                            P=2 * TILE)
    rng = np.random.default_rng(22)
    P = len(rows2)
    c_o1 = rng.integers(0, 60, P).astype(np.int32)
    c_n = rng.integers(0, 40, P).astype(np.int32)
    lines, _ = pack_lines(packed_all)
    pa = np.asarray(packed_all)
    b17 = pa[rows2].T
    b = np.concatenate(
        [b17, np.zeros((W32 - b17.shape[0], P), np.uint32)], axis=0)
    a17 = np.zeros((W32, P), np.uint32)
    for rows1 in (np.sort(rng.integers(0, 55, P)).astype(np.int32),
                  rng.integers(0, 2 * 200, P).astype(np.int32)):
        a17[:b17.shape[0]] = pa[rows1].T
        want_e, want_c = fused_compare_dual(
            jnp.asarray(a17), jnp.asarray(b), jnp.asarray(e_o1),
            jnp.asarray(e_o2), jnp.asarray(e_n), jnp.asarray(c_o1),
            jnp.asarray(c_n), interpret=True)
        got_e, got_c = fused_compare_dual_mxu(
            jnp.asarray(lines), jnp.asarray(b), jnp.asarray(rows1),
            jnp.asarray(e_o1), jnp.asarray(e_o2), jnp.asarray(e_n),
            jnp.asarray(c_o1), jnp.asarray(c_n), interpret=True)
        assert (np.asarray(want_e) == np.asarray(got_e)).all()
        assert (np.asarray(want_c) == np.asarray(got_c)).all()


def test_both_sides_fetch_with_relabeling():
    """verify_windows_fused_mxu_both over a BFS-relabeled workload vs the
    XLA verify path on the ORIGINAL workload (order restored through the
    relabel permutation) — interpret mode.  Also covers the in-graph
    span guard fallback on an unrelabeled (wide-span) workload."""
    import jax.numpy as jnp

    from disco_tpu.overlap.fused_kernel import (
        pack_lines, verify_windows_fused_mxu_both)
    from disco_tpu.overlap.locality import relabel_workload

    store, packed_all, rows1, rows2, o1, o2, n = _fixture(seed=31, P=4096)
    rows1 = np.sort(rows1) % 200            # sorted read ids (fwd side)
    want = np.asarray(verify_windows(
        packed_all, rows1, rows2, o1, o2, n, n_words=store.n_words))

    pa = np.asarray(packed_all)
    (packed_relab, nr1, nr2, perm, label, o1p, o2p, np_) = relabel_workload(
        store.n_reads, pa, rows1, rows2, o1, o2, n)
    lines, _ = pack_lines(packed_relab)
    got_p = np.asarray(verify_windows_fused_mxu_both(
        jnp.asarray(lines), jnp.asarray(nr1), jnp.asarray(nr2),
        jnp.asarray(o1p), jnp.asarray(o2p), jnp.asarray(np_),
        n_words=store.n_words, interpret=True))
    got = np.empty_like(got_p)
    got[perm] = got_p                        # back to original pair order
    assert (want == got).all()

    # guard fallback: feed the UNRELABELED wide-span workload directly
    lines0, _ = pack_lines(pa)
    r2w = rows2.astype(np.int32)
    got_fb = np.asarray(verify_windows_fused_mxu_both(
        jnp.asarray(lines0), jnp.asarray(rows1.astype(np.int32)),
        jnp.asarray(r2w), jnp.asarray(o1), jnp.asarray(o2), jnp.asarray(n),
        n_words=store.n_words, interpret=True))
    assert (want == got_fb).all()


def test_both16_matches_with_relabeling():
    """16-word int8 both-sides kernel vs the XLA verify path (interpret
    mode), including the in-graph fallback on a wide-span workload."""
    import jax.numpy as jnp

    from disco_tpu.overlap.fused_kernel import (
        pack_lines16, verify_windows_fused_mxu_both16)
    from disco_tpu.overlap.locality import relabel_workload

    store, packed_all, rows1, rows2, o1, o2, n = _fixture(seed=41, P=4096)
    rows1 = np.sort(rows1) % 200
    want = np.asarray(verify_windows(
        packed_all, rows1, rows2, o1, o2, n, n_words=store.n_words))
    pa = np.asarray(packed_all)
    (packed_relab, nr1, nr2, perm, label, o1p, o2p, np_) = relabel_workload(
        store.n_reads, pa, rows1, rows2, o1, o2, n)
    lines16, _ = pack_lines16(packed_relab)
    got_p = np.asarray(verify_windows_fused_mxu_both16(
        jnp.asarray(lines16), jnp.asarray(nr1), jnp.asarray(nr2),
        jnp.asarray(o1p), jnp.asarray(o2p), jnp.asarray(np_),
        n_words=store.n_words, interpret=True))
    got = np.empty_like(got_p)
    got[perm] = got_p
    assert (want == got).all()
    # wide-span fallback
    lines0, _ = pack_lines16(pa)
    got_fb = np.asarray(verify_windows_fused_mxu_both16(
        jnp.asarray(lines0), jnp.asarray(rows1.astype(np.int32)),
        jnp.asarray(rows2.astype(np.int32)), jnp.asarray(o1),
        jnp.asarray(o2), jnp.asarray(n), n_words=store.n_words,
        interpret=True))
    assert (want == got_fb).all()
