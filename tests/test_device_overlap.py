"""Device overlap pipeline vs the host parity relation (CPU mesh)."""
import numpy as np

from conftest import GOLDEN
from disco_tpu.index.table import FingerprintTable
from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.device import DeviceOverlapEngine
from disco_tpu.overlap.relation import compute_relation


def test_device_overlap_matches_host_relation():
    d = GOLDEN / "mini"
    store = ReadStore.from_files([str(d / "reads.fasta")], [], 30,
                                 reference_task_order=False)
    table = FingerprintTable.build(store, 29)
    rel = compute_relation(store, table)

    eng = DeviceOverlapEngine(store, table, hit_cap=32)
    starts = eng.window_starts()
    res = eng.run(starts)
    assert int(np.asarray(res.overflow)) == 0

    got_edges = int(np.asarray(res.edge_ok).sum())
    got_cont = int(np.asarray(res.cont_ok).sum())
    assert got_edges == int(rel.edge_ok.sum())
    assert got_cont == int(rel.cont_ok.sum())

    # spot-check the actual (r1, j, r2) triples of verified edges
    r2 = np.asarray(res.r2)
    eok = np.asarray(res.edge_ok)
    qread = starts // store.max_len
    qj = starts % store.max_len
    got = set()
    qi, hi = np.nonzero(eok)
    for a, b in zip(qi, hi):
        got.add((int(qread[a]), int(qj[a]), int(r2[a, b])))
    want = set(zip(rel.r1[rel.edge_ok].tolist(), rel.j[rel.edge_ok].tolist(),
                   rel.r2[rel.edge_ok].tolist()))
    assert got == want
