"""Native C++ MCMF solver (disco_tpu/native/mcmf.cpp) vs the pure-Python
reference implementation: per-arc flow vectors must be IDENTICAL (min-cost
optima are degenerate; downstream pruning consumes arc flows, so the two
solvers must make the same choices — the C++ code is an operation-order
port of the Python one)."""
import glob

import pytest

from conftest import GOLDEN
from disco_tpu.simplify.flow import FlowProblem, _solve_flow_py
from disco_tpu.native import mcmf_solve

import numpy as np


def _parse_dimacs(path: str) -> FlowProblem:
    fp = FlowProblem()
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "p":
                fp.v = int(tok[2])
            elif tok[0] == "a":
                t, h, lb, ub, cost = (int(x) for x in tok[1:6])
                fp.arcs.append((t, h, lb, ub, cost))
    return fp


DUMPS = sorted(glob.glob(str(GOLDEN / "*" / "simplify" / "*dimacs*")))


@pytest.mark.parametrize("dump", DUMPS, ids=[d.split("/")[-3] for d in DUMPS])
def test_native_matches_python_on_golden_dimacs(dump):
    fp = _parse_dimacs(dump)
    assert fp.arcs, f"no arcs parsed from {dump}"
    cols = list(zip(*fp.arcs))
    tail, head, lb, ub, cost = (np.array(c, np.int64) for c in cols)
    native = mcmf_solve(fp.v, tail, head, lb, ub, cost).tolist()
    py = _solve_flow_py(fp)
    assert native == py


def test_native_matches_python_on_random_circulations():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(4, 40))
        fp = FlowProblem()
        fp.v = n
        # random arcs; feasibility guaranteed by a free high-capacity
        # backbone cycle 1->2->...->n->1 (every lb=1 arc can route back)
        for v in range(1, n + 1):
            w = v % n + 1
            fp.arcs.append((v, w, 0, 10_000, 0))
        for _ in range(int(rng.integers(n, 4 * n))):
            t = int(rng.integers(1, n + 1))
            h = int(rng.integers(1, n + 1))
            if t == h:
                continue
            lb = int(rng.integers(0, 2))
            ub = lb + int(rng.integers(1, 10))
            cost = int(rng.integers(0, 100))
            fp.arcs.append((t, h, lb, ub, cost))
        cols = list(zip(*fp.arcs))
        tail, head, lb, ub, cost = (np.array(c, np.int64) for c in cols)
        native = mcmf_solve(fp.v, tail, head, lb, ub, cost).tolist()
        py = _solve_flow_py(fp)
        assert native == py, f"trial {trial} diverged"
