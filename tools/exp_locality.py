"""Round-5 locality analysis (host only): if reads are RENUMBERED by an
overlap-graph BFS layout, do the r2 rows of the r1-sorted candidate
stream fall in small per-tile spans, so BOTH verify sides can ride the
in-kernel block fetch instead of the latency-bound XLA gather?

Outputs per-tile span percentiles for r1 and r2 under (a) original file
order, (b) BFS relabeling, plus the spill fraction at candidate span
budgets.  No device code — pure analysis of the bench workload.
"""
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from disco_tpu.overlap.fused_kernel import TILE  # noqa: E402


def bfs_order(n_reads: int, r1: np.ndarray, r2: np.ndarray) -> np.ndarray:
    """Label reads by BFS over the candidate graph (component by
    component, neighbor order = read id).  Returns perm: old id -> new id.
    Linear-ish time via CSR adjacency."""
    # symmetrize
    src = np.concatenate([r1, r2])
    dst = np.concatenate([r2, r1])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(n_reads + 1))
    label = np.full(n_reads, -1, np.int64)
    nxt = 0
    from collections import deque
    for seed in range(n_reads):
        if label[seed] >= 0:
            continue
        dq = deque([seed])
        label[seed] = nxt
        nxt += 1
        while dq:
            u = dq.popleft()
            for v in dst[starts[u]:starts[u + 1]]:
                if label[v] < 0:
                    label[v] = nxt
                    nxt += 1
                    dq.append(v)
    return label


def tile_stats(rows: np.ndarray, tile=TILE):
    nt = len(rows) // tile
    t = rows[:nt * tile].reshape(nt, tile)
    spans = t.max(axis=1) - t.min(axis=1)
    return {p: int(np.percentile(spans, p)) for p in (50, 90, 99, 100)}


def main():
    import bench as B
    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "bench.fasta")
        B.make_dataset(fasta)
        store, r1, rows2, o1, o2, n = B.candidate_batch(fasta)
    nreads = store.n_reads
    r1 = np.asarray(r1, np.int64)
    rows2 = np.asarray(rows2, np.int64)
    r2 = rows2 % nreads            # undo the rc-row offset
    rc = rows2 // nreads
    print(f"reads={nreads} pairs={len(r1)}")

    print("original order:")
    print("  r1 tile spans (rows):", tile_stats(2 * r1))
    print("  r2 tile spans (rows):", tile_stats(2 * r2))

    t0 = time.time()
    label = bfs_order(nreads, r1, r2)
    print(f"BFS relabel: {time.time() - t0:.2f}s")

    # relabeled packed-row ids: row = 2*newlabel + rc  (fwd/rc interleaved)
    nr1 = label[r1]
    nrows2 = 2 * label[r2] + rc
    order = np.argsort(nr1, kind="stable")
    nr1s = 2 * nr1[order]
    nrows2s = nrows2[order]
    print("BFS relabeled (pairs sorted by new r1):")
    print("  r1 tile spans (rows):", tile_stats(nr1s))
    print("  r2 tile spans (rows):", tile_stats(nrows2s))

    # spill accounting: within each r1-sorted tile, the b-window is the
    # 64-row-aligned window of width WB rows anchored at the tile's r2
    # median; pairs outside it spill to the gather path
    for wb in (256, 512, 1024):
        nt = len(nr1s) // TILE
        t2 = nrows2s[:nt * TILE].reshape(nt, TILE)
        med = np.median(t2, axis=1).astype(np.int64)
        base = np.maximum((med - wb // 2) & ~63, 0)
        inside = (t2 >= base[:, None]) & (t2 < base[:, None] + wb)
        print(f"  b-window {wb} rows: spill "
              f"{100 * (1 - inside.mean()):.2f}%")


if __name__ == "__main__":
    main()
