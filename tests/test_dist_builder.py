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
