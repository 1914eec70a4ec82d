"""Multi-process distributed buildG: launch 2 real processes (CPU backend,
4 virtual devices each -> 8-device global mesh) with
jax.distributed.initialize and byte-compare process 0's outputs to the
single-process goldens.  Converts docs/MULTIHOST.md from prose to a tested
code path (reference surface: runDisco-MPI.sh:214 mpirun -np N)."""
import os
import pathlib
import socket
import subprocess
import sys

import pytest

from conftest import GOLDEN

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nproc, pid, port, args, tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the child sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(ROOT) + ":" + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-m", "disco_tpu.dist.multiproc",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", str(nproc), "--process-id", str(pid),
         "--local-devices", "4", *args],
        env=env, cwd=tmp_path,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


@pytest.mark.slow
@pytest.mark.parametrize("rma", [False, True])
def test_two_process_buildg_parity(tmp_path, rma):
    d = GOLDEN / "mini"
    port = _free_port()
    args = ["-pe", str(d / "reads.fasta"), "-f", str(tmp_path / "MP"),
            "-m-ovl", "30", "-w", "1000"] + (["-rma"] if rma else [])
    procs = [_launch(2, pid, port, args, tmp_path) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"
    for suffix in ("_0_containedReads.txt", "_0_parGraph.txt"):
        got = (tmp_path / ("MP" + suffix)).read_text()
        want = (d / ("mini" + suffix)).read_text()
        assert got == want, f"multiproc{suffix} differs (rma={rma})"
