"""Checkpoint/resume parity: restart from a mid-pipeline checkpoint
(FlowAnalysis complete) and match the oracle's resumed outputs
(reference restart contract: README.md:222-226, main.cpp:316-374)."""
import shutil

import pytest

from conftest import GOLDEN
from disco_tpu.simplify.driver import run_fullsimplify

PARAM_FILES = ["/root/reference/disco.cfg", "/root/reference/disco_2.cfg",
               "/root/reference/disco_3.cfg"]


def test_resume_after_flow(tmp_path):
    d = GOLDEN / "mini"
    gold = d / "resume"
    if not (gold / "mini_scaffoldsFinal_1.fasta").exists():
        pytest.skip("no resume goldens")
    for name in ("mini_0_parGraph.txt", "mini_0_containedReads.txt"):
        shutil.copy(d / name, tmp_path / name)
    shutil.copy(d / "reads.fasta", tmp_path / "reads.fasta")
    # interrupted state: phases through FlowAnalysis completed
    (tmp_path / "mini_SimplificationCheckpointInfo.txt").write_text(
        "Iteration=1\nParSimplify=1\nInitialSimplify=1\n"
        "AggressiveSimplify=1\nFlowAnalysis=1\n")
    shutil.copy(d / "simplify" / "mini_phase_flow_1.txt",
                tmp_path / "mini_CurrGraph_.txt")
    shutil.copy(d / "simplify" / "mini_0_ParSimpleEdges.txt",
                tmp_path / "mini_0_ParSimpleEdges.txt")
    prefix = str(tmp_path / "mini")
    run_fullsimplify([], [], [str(tmp_path / "reads.fasta")],
                     [str(tmp_path / "mini_0_parGraph.txt")],
                     [str(tmp_path / "mini_0_containedReads.txt")],
                     prefix, param_files=PARAM_FILES)
    for name in ("mini_scaffoldsFinal_1.fasta", "mini_phase_postflow_1.txt",
                 "mini_phase_scaffold_1.txt", "mini_UsedReads_1.txt"):
        got = (tmp_path / name).read_bytes()
        want = (gold / name).read_bytes()
        assert got == want, f"{name} differs on resume"
