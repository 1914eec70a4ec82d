"""Pallas compare kernel vs the XLA verify path (interpret mode on the CPU
mesh; on TPU hardware the compiled kernel is exercised by bench tooling)."""
import numpy as np

from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.verify import (make_packed_all, verify_windows,
                                      verify_windows_pallas)


def test_pallas_matches_xla_verify():
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), 2000))
    seqs = [genome[s:s + 100] for s in rng.integers(0, 1900, 200)]
    store = ReadStore.from_sequences(seqs)
    packed_all = make_packed_all(store.packed, store.packed_rc)
    P = 4096
    rows1 = rng.integers(0, 200, P).astype(np.int32)
    rows2 = rng.integers(0, 400, P).astype(np.int32)
    o1 = rng.integers(0, 60, P).astype(np.int32)
    o2 = rng.integers(0, 60, P).astype(np.int32)
    n = rng.integers(0, 40, P).astype(np.int32)
    want = np.asarray(verify_windows(packed_all, rows1, rows2, o1, o2, n,
                                     n_words=store.n_words))
    got = np.asarray(verify_windows_pallas(
        packed_all, rows1, rows2, o1, o2, n, n_words=store.n_words,
        interpret=True))
    assert (want == got).all()
    # exercise real-match positives too: identical windows must verify
    got2 = np.asarray(verify_windows_pallas(
        packed_all, rows1, rows1, o1, o1, n, n_words=store.n_words,
        interpret=True))
    assert got2.all()
