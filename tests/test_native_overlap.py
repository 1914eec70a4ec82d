"""Cross-checks of the native (C++) overlap-relation kernel and traversal
replay against their Python/XLA parity oracles on randomized inputs."""
import numpy as np
import pytest

from disco_tpu.buildg import replay
from disco_tpu.index.table import FingerprintTable
from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.relation import compute_relation


def _random_reads(rng, genome_len=4000, n_pairs=250, read_len=(60, 100)):
    genome = "".join(rng.choice(list("ACGT"), genome_len))
    comp = str.maketrans("ACGT", "TGCA")
    seqs = []
    for _ in range(n_pairs):
        ln = int(rng.integers(*read_len))
        pos = int(rng.integers(0, genome_len - ln))
        s = genome[pos:pos + ln]
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        seqs.append(s)
    return seqs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_relation_matches_xla(seed):
    rng = np.random.default_rng(seed)
    seqs = _random_reads(rng)
    store = ReadStore.from_sequences(seqs)
    table = FingerprintTable.build(store, 29)
    rel_n = compute_relation(store, table, backend="native")
    rel_x = compute_relation(store, table, backend="xla")
    assert len(rel_n) == len(rel_x) > 0
    for f in ("r1", "j", "r2", "orient", "typ", "cont_ok", "edge_ok"):
        assert np.array_equal(getattr(rel_n, f), getattr(rel_x, f)), f


@pytest.mark.parametrize("seed,wpgs", [(0, 1000), (1, 50), (2, 7)])
def test_native_replay_matches_python(seed, wpgs):
    rng = np.random.default_rng(seed)
    seqs = _random_reads(rng)
    store = ReadStore.from_sequences(seqs)
    table = FingerprintTable.build(store, 29)
    rel = compute_relation(store, table)
    superread, _ = replay.containment_replay(rel, store)
    lines = replay.build_graph_replay(rel, store, superread, wpgs)
    blob, _, _ = replay.build_graph_replay_native(rel, store, superread,
                                                 wpgs)
    assert blob.decode() == "".join(ln + "\n" for ln in lines)


def test_two_pass_modes_compose_to_full_relation():
    """Mode 1 (containment-only) rows must equal the full relation's cont
    rows; mode 2 (edge-only over uncontained reads) rows must equal the
    edge rows the traversal replay consumes (both endpoints uncontained)."""
    from disco_tpu import native

    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), 4000))
    seqs = []
    for _ in range(400):
        ln = int(rng.integers(45, 160))
        s = int(rng.integers(0, 4000 - ln))
        seqs.append(genome[s:s + ln])
    store = ReadStore.from_sequences(seqs)
    table = FingerprintTable.build(store, 29)
    full = compute_relation(store, table, backend="native")
    superread, _ = replay.containment_replay(full, store)
    contained = (superread[1:store.n_reads + 1] != 0).astype(np.uint8)

    cont = native.overlap_relation_mode(
        store.packed, store.packed_rc, store.lengths, table.keys,
        table.read, table.orient, table.typ, table.k, mode=1)
    m = full.cont_ok
    np.testing.assert_array_equal(cont["r1"], full.r1[m])
    np.testing.assert_array_equal(cont["j"], full.j[m])
    np.testing.assert_array_equal(cont["r2"], full.r2[m])

    edge = native.overlap_relation_mode(
        store.packed, store.packed_rc, store.lengths, table.keys,
        table.read, table.orient, table.typ, table.k, mode=2,
        contained=contained)
    m = full.edge_ok & (contained[full.r1] == 0) & (contained[full.r2] == 0)
    np.testing.assert_array_equal(edge["r1"], full.r1[m])
    np.testing.assert_array_equal(edge["j"], full.j[m])
    np.testing.assert_array_equal(edge["r2"], full.r2[m])
    np.testing.assert_array_equal(edge["orient"], full.orient[m])
    assert contained.any() and len(edge["r1"]) < int(full.edge_ok.sum())
