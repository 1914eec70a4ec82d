"""Golden-output parity: our buildG front end vs the reference binary.

Golden files were produced by the reference `buildG -t 1 -m 4` (which pins
writeParGraphSize=1000) on the committed fixture inputs; see
tools/build_reference.sh and tests/golden/*/buildg.cfg.
"""
import pathlib

import pytest

from conftest import GOLDEN
from disco_tpu.buildg.pipeline import run_buildg

# wsize: the reference pins writeParGraphSize from the -m flag
# (reference: src/BuildGraph/src/OverlapGraph.cpp:67-81); goldens were run
# with -m 4 (-> 1000) except ecoli which used -m 8 (-> 20000).
CASES = [
    ("micro", "micro", [], ["reads.fasta"], 1000),
    ("microC", "microC", [], ["reads.fasta"], 1000),
    ("mini", "mini", ["reads.fasta"], [], 1000),
    # mixed: single-end + two paired files (reference: buildG -se ... -pe
    # f1,f2) — exercises multi-dataset read-ID ranges and SE/PE mixing
    ("mixed", "mixed", ["p1.fasta", "p2.fasta"], ["se.fasta"], 1000),
    pytest.param("ecoli", "ecoli", ["reads.fasta"], [], 20000,
                 marks=pytest.mark.slow),
]


def test_buildg_fastq_input(tmp_path):
    """FASTQ input produces the same outputs as FASTA of the same reads
    (reference sniffs the format from the first byte and ignores quality,
    src/BuildGraph/src/Dataset.cpp:260-293; verified against the reference
    binary on fresh data — see verify skill)."""
    d = GOLDEN / "mini"
    fq = tmp_path / "reads.fastq"
    with open(d / "reads.fasta") as f, open(fq, "w") as out:
        name, seq = None, ""
        for line in f:
            if line.startswith(">"):
                if name:
                    out.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
                name, seq = line[1:].strip(), ""
            else:
                seq += line.strip()
        out.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    out_prefix = str(tmp_path / "mini")
    run_buildg([str(fq)], [], out_prefix, min_overlap=30,
               write_par_graph_size=1000)
    for suffix in ("_0_containedReads.txt", "_0_parGraph.txt"):
        got = pathlib.Path(out_prefix + suffix).read_text()
        want = (d / ("mini" + suffix)).read_text()
        assert got == want, f"fastq{suffix} differs"


@pytest.mark.parametrize("case,prefix,pe,se,wsize", CASES)
def test_buildg_parity(case, prefix, pe, se, wsize, tmp_path):
    d = GOLDEN / case
    if not d.exists():
        pytest.skip(f"golden dir {d} missing")
    pe = [str(d / f) for f in pe]
    se = [str(d / f) for f in se]
    out = str(tmp_path / prefix)
    run_buildg(pe, se, out, min_overlap=30, write_par_graph_size=wsize)

    # _0_startRead.txt carries the per-chunk BFS start IDs (the reference's
    # restart checkpoint, OverlapGraph.cpp:203-207) — compared since round 3
    for suffix in ("_0_containedReads.txt", "_0_parGraph.txt",
                   "_0_startRead.txt"):
        got = pathlib.Path(out + suffix).read_text()
        want = (d / (prefix + suffix)).read_text()
        assert got == want, f"{case}{suffix} differs"


def test_one_pass_mem_budget_matches_two_pass(tmp_path):
    """-m budgets large enough select the one-pass protocol (single probe
    sweep); outputs must be byte-identical to the bounded-memory two-pass
    default."""
    import os
    import shutil

    from conftest import GOLDEN
    from disco_tpu.buildg.pipeline import run_buildg

    reads = str(GOLDEN / "mini" / "reads.fasta")
    os.environ["DISCO_TPU_BACKEND"] = "native"
    try:
        run_buildg([reads], [], str(tmp_path / "TP"), min_overlap=30,
                   write_par_graph_size=1000)
        run_buildg([reads], [], str(tmp_path / "OP"), min_overlap=30,
                   write_par_graph_size=1000, max_mem_gb=64)
    finally:
        del os.environ["DISCO_TPU_BACKEND"]
    for suf in ("_0_parGraph.txt", "_0_containedReads.txt",
                "_0_startRead.txt"):
        a = (tmp_path / f"TP{suf}").read_bytes()
        b = (tmp_path / f"OP{suf}").read_bytes()
        assert a == b, suf
