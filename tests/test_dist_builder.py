"""Distributed buildG over the 8-device CPU mesh produces files identical to
the committed single-thread reference goldens."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import GOLDEN
from disco_tpu.dist.builder import run_buildg_sharded


@pytest.mark.parametrize("fix", ["micro", "mini"])
def test_sharded_buildg_matches_reference(fix, tmp_path, monkeypatch):
    import shutil
    d = GOLDEN / fix
    shutil.copy(d / "reads.fasta", tmp_path / "reads.fasta")
    monkeypatch.chdir(tmp_path)  # golden ReadIDMap embeds the relative path
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    prefix = str(tmp_path / fix)
    # micro's goldens were generated with -se (singleton), mini's with -pe
    paired = ["reads.fasta"] if fix == "mini" else []
    single = [] if fix == "mini" else ["reads.fasta"]
    run_buildg_sharded(paired, single, prefix, mesh,
                       min_overlap=30, write_par_graph_size=1000)
    for name in ("_0_parGraph.txt", "_0_containedReads.txt",
                 "_ReadIDMap.txt"):
        got = (tmp_path / f"{fix}{name}").read_bytes()
        want = (d / f"{fix}{name}").read_bytes()
        assert got == want, f"{fix}{name} differs"


def test_sharded_buildg_overflow_fallback(tmp_path, monkeypatch):
    """A route_cap far below the real per-peer load forces every chunk
    through the exact host fallback (dist.builder._chunk_fallback); outputs
    must still be byte-identical and the fallback must be counted."""
    import shutil
    d = GOLDEN / "mini"
    shutil.copy(d / "reads.fasta", tmp_path / "reads.fasta")
    monkeypatch.chdir(tmp_path)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    stats = {}
    run_buildg_sharded(["reads.fasta"], [], str(tmp_path / "mini"), mesh,
                       min_overlap=30, write_par_graph_size=1000,
                       budget=1 << 13, route_cap=8, stats=stats)
    assert stats["fallback_chunks"] >= 1, stats
    assert stats["chunks"] >= 2, stats
    for name in ("_0_parGraph.txt", "_0_containedReads.txt"):
        got = (tmp_path / f"mini{name}").read_bytes()
        want = (d / f"mini{name}").read_bytes()
        assert got == want, f"mini{name} differs under overflow fallback"
