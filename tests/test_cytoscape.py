"""Cytoscape TSV dump sanity (format matches the reference's cytoscape
branch of operator<<, OverlapGraph.cpp:1969-1986)."""
import io

from conftest import GOLDEN
from disco_tpu.simplify.cytoscape import write_cytoscape
from disco_tpu.simplify.dataset import SimplifyDataset
from disco_tpu.simplify.engine import FullGraph
from disco_tpu.simplify.params import Params


def test_cytoscape_dump():
    d = GOLDEN / "mini"
    ds = SimplifyDataset([], [], [str(d / "reads.fasta")])
    ds.store_contained_read_info([str(d / "mini_0_containedReads.txt")])
    g = FullGraph(ds, Params())
    g.read_par_edges(str(d / "simplify" / "mini_0_ParSimpleEdges.txt"))
    buf = io.StringIO()
    write_cytoscape(g, buf)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("source\ttarget\t")
    n_smaller = sum(1 for e in g.get_edges() if e.is_smaller())
    assert len(lines) - 1 == n_smaller
    for row in lines[1:]:
        assert len(row.split("\t")) == 8
