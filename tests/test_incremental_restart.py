"""Mid-graph-phase incremental restart (reference:
src/BuildGraph/src/OverlapGraph.cpp:123-211): kill the build after k
flushed parGraph chunks, rerun the same command, final files byte-identical
to an uninterrupted run — for the single-node and the sharded builder."""
import pathlib
import shutil

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import GOLDEN
from disco_tpu.buildg import replay
from disco_tpu.buildg.pipeline import run_buildg
from disco_tpu.index.table import FingerprintTable
from disco_tpu.io.readstore import ReadStore
from disco_tpu.overlap.relation import compute_relation

WPGS = 20  # small chunks -> many kill points on the mini fixture


def _full_state(tmp_path):
    """Uninterrupted run + the replay internals needed to fabricate an
    exact mid-run kill state."""
    d = GOLDEN / "mini"
    files = [str(d / "reads.fasta")]
    full = tmp_path / "full"
    full.mkdir()
    run_buildg(files, [], str(full / "P"), min_overlap=30,
               write_par_graph_size=WPGS)
    store = ReadStore.from_files(files, [], 30)
    table = FingerprintTable.build(store, 29)
    rel = compute_relation(store, table, backend="native")
    superread, _ = replay.containment_replay(rel, store)
    blob, starts_blob, chunk_ends = replay.build_graph_replay_native(
        rel, store, superread, WPGS)
    assert (full / "P_0_parGraph.txt").read_bytes() == blob
    assert (full / "P_0_startRead.txt").read_bytes() == starts_blob
    return files, full, blob, starts_blob.decode().splitlines(), chunk_ends


@pytest.mark.parametrize("frac", [0.25, 0.6, 0.95])
def test_single_node_restart(tmp_path, frac):
    files, full, blob, start_lines, chunk_ends = _full_state(tmp_path)
    n_chunks = len(chunk_ends)
    assert n_chunks >= 4, "fixture too small for a restart test"
    k = max(1, int(n_chunks * frac))  # killed DURING chunk k (0-based)
    if k >= n_chunks:
        k = n_chunks - 1

    killed = tmp_path / f"killed{frac}"
    killed.mkdir()
    # state at the kill: chunks [0, k) flushed; startRead has lines [0, k]
    # (chunk k's start was written before processing began); the contained
    # phase had completed (CCR checkpoint)
    (killed / "K_0_parGraph.txt").write_bytes(blob[:chunk_ends[k - 1]])
    (killed / "K_0_startRead.txt").write_text(
        "".join(ln + "\n" for ln in start_lines[:k + 1]))
    shutil.copy(full / "P_0_containedReads.txt",
                killed / "K_0_containedReads.txt")
    (killed / "K_CheckpointInfo.txt").write_text("CCR=Complete\n")

    run_buildg(files, [], str(killed / "K"), min_overlap=30,
               write_par_graph_size=WPGS)

    got = (killed / "K_0_parGraph.txt").read_bytes()
    assert got == blob, f"restart at chunk {k}/{n_chunks} diverged"
    # the re-run's startRead carries only the post-restart chunk starts,
    # beginning at the killed chunk's start (reference truncates the file)
    sr = (killed / "K_0_startRead.txt").read_text().splitlines()
    assert sr[0] == start_lines[k]
    ck = (killed / "K_CheckpointInfo.txt").read_text()
    assert "GC=Complete" in ck


def test_sharded_builder_restart(tmp_path):
    from disco_tpu.dist.builder import run_buildg_sharded

    files, full, blob, start_lines, chunk_ends = _full_state(tmp_path)
    k = len(chunk_ends) // 2
    killed = tmp_path / "killed_sharded"
    killed.mkdir()
    (killed / "K_0_parGraph.txt").write_bytes(blob[:chunk_ends[k - 1]])
    (killed / "K_0_startRead.txt").write_text(
        "".join(ln + "\n" for ln in start_lines[:k + 1]))
    shutil.copy(full / "P_0_containedReads.txt",
                killed / "K_0_containedReads.txt")
    (killed / "K_CheckpointInfo.txt").write_text("CCR=Complete\n")

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("dp",))
    run_buildg_sharded(files, [], str(killed / "K"), mesh, min_overlap=30,
                       write_par_graph_size=WPGS)
    assert (killed / "K_0_parGraph.txt").read_bytes() == blob
    # a second invocation is a no-op (GC=Complete honored)
    before = (killed / "K_0_parGraph.txt").read_bytes()
    run_buildg_sharded(files, [], str(killed / "K"), mesh, min_overlap=30,
                       write_par_graph_size=WPGS)
    assert (killed / "K_0_parGraph.txt").read_bytes() == before
