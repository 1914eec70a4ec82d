"""Dist-mem mode (buildG-MPIRMA equivalent): the packed read payload is
truly partitioned across the mesh — each device's addressable shard holds
only its N/n_dev read slice — and outputs stay byte-identical to the
single-device builder."""
import pathlib

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conftest import GOLDEN
from disco_tpu.dist.builder import run_buildg_sharded, sharded_relation
from disco_tpu.dist.overlap_shard import DistMemOverlapEngine
from disco_tpu.index.table import FingerprintTable
from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.relation import compute_relation


def _mesh(n=8):
    devs = jax.devices("cpu")[:n]
    assert len(devs) == n
    return Mesh(np.array(devs), ("dp",))


def _load(case="mini", min_ovl=30):
    d = GOLDEN / case
    store = ReadStore.from_files([str(d / "reads.fasta")], [], min_ovl)
    table = FingerprintTable.build(store, min_ovl - 1)
    return store, table


def test_payload_actually_partitioned():
    """The committed payload's per-device shard is 1/n of the rows — the
    property Disco's RMA window provides
    (reference: src/BuildGraphMPIRMA/src/HashTable.cpp:92-119,422-435)."""
    store, table = _load()
    mesh = _mesh()
    n = mesh.devices.size
    packed_sh, packed_rc_sh, block = DistMemOverlapEngine.shard_payload(
        store, n)
    assert packed_sh.shape[0] == n * block
    arr = jax.device_put(packed_sh, NamedSharding(mesh, P("dp")))
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(block, packed_sh.shape[1])}
    # round-robin ownership: shard s's slice holds reads r with r % n == s
    rid = np.arange(store.n_reads)
    for s in range(n):
        own = rid[rid % n == s]
        got = packed_sh[s * block: s * block + len(own)]
        np.testing.assert_array_equal(got, store.packed[own])


def test_dist_mem_relation_matches_native():
    store, table = _load()
    want = compute_relation(store, table, backend="native")
    got = sharded_relation(store, table, _mesh(), dist_mem=True)
    assert len(got) == len(want)
    for f in ("r1", "j", "r2", "orient", "typ", "cont_ok", "edge_ok"):
        np.testing.assert_array_equal(getattr(got, f), getattr(want, f),
                                      err_msg=f)


@pytest.mark.slow
def test_dist_mem_buildg_byte_parity(tmp_path):
    d = GOLDEN / "mini"
    run_buildg_sharded([str(d / "reads.fasta")], [],
                       str(tmp_path / "DM"), _mesh(), min_overlap=30,
                       write_par_graph_size=1000, dist_mem=True)
    # (_ReadIDMap.txt embeds the input path, so it is compared in the
    # single-node golden tests that chdir; here the graph files suffice)
    for suffix in ("_0_containedReads.txt", "_0_parGraph.txt"):
        got = pathlib.Path(str(tmp_path / "DM") + suffix).read_text()
        want = (d / ("mini" + suffix)).read_text()
        assert got == want, f"dist-mem{suffix} differs"


@pytest.mark.parametrize("dist_mem", [False, True])
def test_pruned_relation_skips_contained_work(dist_mem):
    """In-loop containment marking feeds the all_gathered mask union, and
    later supersteps demonstrably skip candidates touching contained reads
    (fewer relation rows), while the replay-visible rows are unchanged
    (VERDICT r2 item 8; reference work pruning:
    src/BuildGraph/src/OverlapGraph.cpp:435-436)."""
    from disco_tpu.buildg import replay
    from disco_tpu.dist.builder import sharded_relation_pruned

    # containment-rich workload: variable-length reads from one genome, so
    # short reads are contained in long ones across the whole read range
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    seqs = []
    for _ in range(500):
        ln = int(rng.integers(40, 120))
        s = int(rng.integers(0, 3000 - ln))
        seqs.append(genome[s:s + ln])
    store = ReadStore.from_sequences(seqs)
    table = FingerprintTable.build(store, 29)
    mesh = _mesh()
    full = compute_relation(store, table, backend="native")
    # small budget -> many chunks -> marks from early chunks prune late ones
    rel, superread, lines = sharded_relation_pruned(
        store, table, mesh, budget=1 << 12, dist_mem=dist_mem)
    assert (superread != 0).any(), "fixture has contained reads"
    assert len(rel) < len(full), "pruning removed no rows"

    # byte-level equivalence of everything downstream consumes
    want_sr, want_lines = replay.containment_replay(full, store)
    np.testing.assert_array_equal(superread, want_sr)
    assert lines == want_lines
    got_blob = replay.build_graph_replay_native(rel, store, superread, 1000)
    want_blob = replay.build_graph_replay_native(full, store, want_sr, 1000)
    assert got_blob[0] == want_blob[0]
    assert got_blob[1] == want_blob[1]
