"""streamContigsThresh parity: the benchmark-specific contig
post-processing path (reference: OverlapGraph::streamContigsThresh,
src/SimplifyGraph/src/OverlapGraph.cpp:2377-2635), triggered when the
dataset read count is one of the hard-coded sizes in Utils::populateThresh
(Utils.cpp:671-679; 146 reads -> N50 target 2800).

Fixture: 146 interleaved reads over three small genomes (3 contigs of
3027/1318/1092 bp).  Goldens from the patched reference oracle
(tools/build_reference.sh) run with PrintContigs=true and
  - ref_tab:   -simPth with test/2800.txt (split the 3027 contig at
               1200/2100) + test/2800_join.txt (join 1318 + rc(1092)) —
               exercises split, fingerprint join and greedy concatenation;
  - ref_notab: -simPth without tables — exercises the above-threshold
               cumulative-N50 branch.
"""
import shutil

import pytest

from conftest import GOLDEN
from disco_tpu.simplify.driver import run_fullsimplify

D = GOLDEN / "thresh146"

OUTPUTS = ["R_contigsFinal_1.fasta", "R_contigEdgesFinal_1.txt",
           "R_contigEdgeCoverageFinal_1.txt", "R_scaffoldsFinal_1.fasta",
           "R_UsedReads_1.txt"]


@pytest.mark.parametrize("variant", ["tab", "notab"])
def test_stream_contigs_thresh_parity(variant, tmp_path):
    sim = tmp_path / "simdir"
    (sim / "test").mkdir(parents=True)
    if variant == "tab":
        for f in ("2800.txt", "2800_join.txt"):
            shutil.copy(D / "simdir" / "test" / f, sim / "test" / f)
    for f in ("reads146.fasta", "T_0_parGraph.txt",
              "T_0_containedReads.txt"):
        shutil.copy(D / f, tmp_path / f)
    prefix = str(tmp_path / "R")
    run_fullsimplify(
        [], [], [str(tmp_path / "reads146.fasta")],
        [str(tmp_path / "T_0_parGraph.txt")],
        [str(tmp_path / "T_0_containedReads.txt")], prefix,
        param_files=[str(D / "cfg.cfg"), str(D / "cfg_2.cfg"),
                     str(D / "cfg_3.cfg")],
        sim_path=str(sim))
    for name in OUTPUTS:
        got = (tmp_path / name).read_bytes()
        want = (D / f"ref_{variant}" / name).read_bytes()
        assert got == want, f"{variant}/{name} differs"
