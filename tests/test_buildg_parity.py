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
    pytest.param("ecoli", "ecoli", ["reads.fasta"], [], 20000,
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("case,prefix,pe,se,wsize", CASES)
def test_buildg_parity(case, prefix, pe, se, wsize, tmp_path):
    d = GOLDEN / case
    if not d.exists():
        pytest.skip(f"golden dir {d} missing")
    pe = [str(d / f) for f in pe]
    se = [str(d / f) for f in se]
    out = str(tmp_path / prefix)
    run_buildg(pe, se, out, min_overlap=30, write_par_graph_size=wsize)

    for suffix in ("_0_containedReads.txt", "_0_parGraph.txt"):
        got = pathlib.Path(out + suffix).read_text()
        want = (d / (prefix + suffix)).read_text()
        assert got == want, f"{case}{suffix} differs"
