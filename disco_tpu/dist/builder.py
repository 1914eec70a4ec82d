"""Distributed graph construction: the BuildGraphMPI / BuildGraphMPIRMA
equivalent (reference: src/BuildGraphMPI/, src/BuildGraphMPIRMA/).

The overlap relation is computed on an n-device mesh via the sharded
superstep (query axis data-parallel, fingerprint table hash-sharded,
all_to_all candidate routing) and assembled into the SAME deterministic
relation order as the single-chip host path, so the sequential replay emits
output files byte-identical to a single-process reference run — by
construction, unlike the reference whose multi-process output depends on
rank/thread scheduling (SURVEY.md §4)."""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..index.table import FingerprintTable
from ..io.readstore import ReadStore
from ..overlap.relation import OverlapRelation, window_codes
from ..overlap.verify import make_packed_all
from .overlap_shard import ShardedOverlapEngine


def sharded_relation(store: ReadStore, table: FingerprintTable, mesh: Mesh,
                     hit_cap: int = 16,
                     route_cap: Optional[int] = None) -> OverlapRelation:
    """Compute the verified overlap relation on the mesh."""
    n_dev = mesh.devices.size
    qread, qj, qcode = window_codes(store, table.k)
    q = len(qread)
    if route_cap is None:
        # every query could land on one owner shard in the worst case
        route_cap = -(-q // n_dev)
        route_cap = -(-route_cap // 8) * 8
    eng = ShardedOverlapEngine.build(store, table, mesh, hit_cap=hit_cap,
                                     route_cap=route_cap)
    step = eng.make_step()

    pad = (-q) % n_dev
    qread_p = np.pad(qread, (0, pad))
    qj_p = np.pad(qj, (0, pad), constant_values=-1)
    qcode_p = np.pad(qcode, (0, pad),
                     constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))
    packed_all = make_packed_all(store.packed, store.packed_rc)
    lengths = np.asarray(store.lengths, np.int32)
    marked = np.zeros(store.n_reads, np.int32)
    marked = np.pad(marked, (0, (-len(marked)) % n_dev))

    r2, orient, typ, edge_ok, cont_ok, overflow, _unions = step(
        packed_all, lengths, qread_p, qj_p, qcode_p, marked)
    if int(np.asarray(overflow).sum()) != 0:
        raise RuntimeError(
            "sharded overlap overflow: raise hit_cap/route_cap")

    r2 = np.asarray(r2)[:q]
    orient = np.asarray(orient)[:q]
    typ = np.asarray(typ)[:q]
    edge_ok = np.asarray(edge_ok)[:q]
    cont_ok = np.asarray(cont_ok)[:q]

    keep = edge_ok | cont_ok
    qi, hi = np.nonzero(keep)
    r1f = qread[qi].astype(np.int32)
    jf = qj[qi]
    r2f = r2[qi, hi].astype(np.int32)
    of = orient[qi, hi].astype(np.int8)
    tf = typ[qi, hi].astype(np.int8)
    ef = edge_ok[qi, hi]
    cf = cont_ok[qi, hi]
    fidx2 = store.file_index[r2f]
    order = np.lexsort((tf, fidx2, jf, r1f))
    return OverlapRelation(
        r1=r1f[order], j=jf[order], r2=r2f[order], orient=of[order],
        typ=tf[order], cont_ok=cf[order], edge_ok=ef[order], k=table.k)


def run_buildg_sharded(paired_files: Sequence[str],
                       single_files: Sequence[str], prefix: str,
                       mesh: Mesh, min_overlap: int = 30,
                       write_par_graph_size: int = 1000):
    """Distributed buildG: same outputs as buildg.pipeline.run_buildg, with
    the overlap phase executed over the mesh."""
    from ..buildg import replay

    store = ReadStore.from_files(paired_files, single_files, min_overlap,
                                 id_map_path=prefix + "_ReadIDMap.txt")
    table = FingerprintTable.build(store, min_overlap - 1)
    rel = sharded_relation(store, table, mesh)
    superread, cont_lines = replay.containment_replay(rel, store)
    par_blob = replay.build_graph_replay_native(rel, store, superread,
                                                write_par_graph_size)
    with open(prefix + "_0_containedReads.txt", "w") as f:
        for ln in cont_lines:
            f.write(ln + "\n")
    with open(prefix + "_0_parGraph.txt", "wb") as f:
        f.write(par_blob)
    with open(prefix + "_CheckpointInfo.txt", "w") as f:
        f.write("CCR=Complete\nGC=Complete\n")
    with open(prefix + "_0_startRead.txt", "w") as f:
        pass
    return store, rel, superread
