"""buildG checkpoint/restart (reference: main.cpp:45-52 + restart contract
README.md:222-226): CCR=Complete reuses the contained-read file; GC=Complete
makes the run a no-op."""
import shutil

from conftest import GOLDEN
from disco_tpu.buildg.pipeline import run_buildg


def test_buildg_resume_after_ccr(tmp_path, monkeypatch):
    d = GOLDEN / "micro"
    shutil.copy(d / "reads.fasta", tmp_path / "reads.fasta")
    monkeypatch.chdir(tmp_path)
    prefix = "micro"
    run_buildg([], ["reads.fasta"], prefix, min_overlap=30)
    want_par = (tmp_path / "micro_0_parGraph.txt").read_bytes()
    want_cont = (tmp_path / "micro_0_containedReads.txt").read_bytes()
    assert want_par == (d / "micro_0_parGraph.txt").read_bytes()

    # simulate a crash after the contained-read phase: keep CCR, drop GC
    (tmp_path / "micro_CheckpointInfo.txt").write_text("CCR=Complete\n")
    (tmp_path / "micro_0_parGraph.txt").unlink()
    run_buildg([], ["reads.fasta"], prefix, min_overlap=30)
    assert (tmp_path / "micro_0_parGraph.txt").read_bytes() == want_par
    assert (tmp_path / "micro_0_containedReads.txt").read_bytes() == want_cont
    assert "GC=Complete" in (
        tmp_path / "micro_CheckpointInfo.txt").read_text()

    # completed run: a rerun must be a no-op
    (tmp_path / "micro_0_parGraph.txt").write_bytes(b"sentinel")
    out = run_buildg([], ["reads.fasta"], prefix, min_overlap=30)
    assert out == (None, None, None)
    assert (tmp_path / "micro_0_parGraph.txt").read_bytes() == b"sentinel"
