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
