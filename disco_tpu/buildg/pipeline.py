"""buildG-equivalent front end: reads -> contained reads + overlap edges.

Parity mode writes files bit-identical to a single-threaded reference
`buildG` run (reference: src/BuildGraph/src/main.cpp:24-73):
  <prefix>_ReadIDMap.txt, <prefix>_0_containedReads.txt,
  <prefix>_0_parGraph.txt, <prefix>_CheckpointInfo.txt
"""
import os
from typing import Optional, Sequence

from ..index.table import FingerprintTable
from ..io.readstore import ReadStore
from ..overlap.relation import compute_relation
from . import replay


def run_buildg(paired_files: Sequence[str], single_files: Sequence[str],
               prefix: str, min_overlap: int = 30,
               write_par_graph_size: int = 1000,
               store: Optional[ReadStore] = None):
    """Full graph-construction phase. Returns (store, relation, superread)."""
    if store is None:
        store = ReadStore.from_files(paired_files, single_files, min_overlap,
                                     id_map_path=prefix + "_ReadIDMap.txt")
    table = FingerprintTable.build(store, min_overlap - 1)
    rel = compute_relation(store, table)

    superread, cont_lines = replay.containment_replay(rel, store)
    par_lines = replay.build_graph_replay(rel, store, superread,
                                          write_par_graph_size)

    with open(prefix + "_0_containedReads.txt", "w") as f:
        for ln in cont_lines:
            f.write(ln + "\n")
    with open(prefix + "_0_parGraph.txt", "w") as f:
        for ln in par_lines:
            f.write(ln + "\n")
    # reference: OverlapGraph.cpp:486-493 + main.cpp:63-70
    with open(prefix + "_CheckpointInfo.txt", "w") as f:
        f.write("CCR=Complete\nGC=Complete\n")
    # reference writes an (empty after completion) per-thread start-read file
    with open(prefix + "_0_startRead.txt", "w") as f:
        pass
    return store, rel, superread
