"""Sharded overlap superstep vs the single-device relation (8-dev CPU mesh)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import GOLDEN
from disco_tpu.dist.overlap_shard import ShardedOverlapEngine
from disco_tpu.index.table import FingerprintTable
from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.relation import compute_relation, window_codes
from disco_tpu.overlap.verify import make_packed_all


def test_sharded_superstep_matches_host_relation():
    d = GOLDEN / "mini"
    if not d.exists():
        pytest.skip("mini fixture missing")
    store = ReadStore.from_files([str(d / "reads.fasta")], [], 30,
                                 reference_task_order=False)
    table = FingerprintTable.build(store, 29)
    rel = compute_relation(store, table)
    want = int(rel.edge_ok.sum())

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    eng = ShardedOverlapEngine.build(store, table, mesh,
                                     hit_cap=32, route_cap=1 << 16)
    step = eng.make_step()

    qread, qj, qcode = window_codes(store, 29)
    # pad query axis to a multiple of the mesh size
    pad = (-len(qread)) % mesh.devices.size
    qread = np.pad(qread, (0, pad))
    qj = np.pad(qj, (0, pad), constant_values=-1)  # j=-1 never edge-valid
    qcode = np.pad(qcode, (0, pad), constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))

    packed_all = make_packed_all(store.packed, store.packed_rc)
    lengths = np.asarray(store.lengths, np.int32)
    marked = np.zeros(store.n_reads, np.int32)
    pad_m = (-len(marked)) % mesh.devices.size
    marked = np.pad(marked, (0, pad_m))

    r2, orient, typ, edge_ok, cont_ok, overflow, unions = step(
        packed_all, lengths, qread, qj, qcode, marked)
    assert int(np.asarray(overflow).sum()) == 0
    got = int(np.asarray(edge_ok).sum())
    assert got == want, (got, want)


def test_sharded_relation_polyT_and_chunking(tmp_path):
    """A read with a window of all-T bases hashes to the same key as the
    table's PAD entries; the clamped lookup must not sweep the pad run into
    its bucket.  Also runs with a tiny chunk budget so the relation is
    assembled from many supersteps (regression for the unbounded
    single-superstep memory blowup)."""
    import random
    from disco_tpu.dist.builder import sharded_relation

    rng = random.Random(5)
    base = "".join(rng.choice("ACGT") for _ in range(400))
    reads = [base[i:i + 100] for i in range(0, 280, 20)]
    # read with a 40-T interior run (passes QC: 40+~15 T of 100 < 70%)
    polyt = base[:30] + "T" * 40 + base[30:60]
    reads.append(polyt)
    reads.append(polyt[:80])  # overlaps the poly-T read
    fa = tmp_path / "r.fasta"
    with open(fa, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")

    store = ReadStore.from_files([str(fa)], [], 30,
                                 reference_task_order=False)
    table = FingerprintTable.build(store, 29)
    want = compute_relation(store, table)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    got = sharded_relation(store, table, mesh, budget=1 << 12)
    assert len(got) == len(want)
    for f in ("r1", "j", "r2", "orient", "typ", "cont_ok", "edge_ok"):
        assert (getattr(got, f) == getattr(want, f)).all(), f
