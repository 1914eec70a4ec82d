"""fullsimplify driver: the iteration/phase pipeline
(reference: src/SimplifyGraph/src/main.cpp:30-294).

Phase snapshots are written with the same names the patched oracle produces
(<prefix>_phase_<name>_<iter>.txt) so parity tests diff them directly.
"""
import os
from typing import List, Optional

from .core import Alloc
from .dataset import SimplifyDataset
from .engine import FullGraph
from .params import Params
from .pargraph import parsimplify


def run_fullsimplify(single_files: List[str], pair_files: List[str],
                     inter_pair_files: List[str], edge_files: List[str],
                     contained_files: List[str], prefix: str,
                     param_files: Optional[List[str]] = None,
                     max_iters: int = 3) -> SimplifyDataset:
    """Equivalent of `fullsimplify -fs/-fp/-fpi ... -e ... -crd ... -o ...`.

    param_files: up to three cfg paths (iteration 1..3); missing entries
    reuse the defaults-only state like the reference would fail — pass all
    three for parity runs.
    """
    dataset = SimplifyDataset(single_files, pair_files, inter_pair_files)
    dataset.store_contained_read_info(contained_files)

    params = Params()
    ctg_count = 0
    scf_count = 0
    checkpoints: List[str] = []

    def checkpoint(line: str) -> None:
        checkpoints.append(line)
        with open(prefix + "_SimplificationCheckpointInfo.txt", "a") as f:
            f.write(line + "\n")

    for iteration in range(1, max_iters + 1):
        dataset.clear_edge_info()
        for i in range(1, dataset.size() + 1):
            dataset.used[i] = False
        if param_files:
            params.set_parameters(param_files[min(iteration - 1,
                                                  len(param_files) - 1)])
        cont = _simplify_iteration(dataset, params, edge_files, prefix,
                                   iteration, checkpoint,
                                   single_files, pair_files,
                                   inter_pair_files, ctg_count, scf_count)
        ctg_count = cont["ctg_count"]
        scf_count = cont["scf_count"]
        if not cont["continue"]:
            break
    return dataset


def _simplify_iteration(dataset: SimplifyDataset, params: Params,
                        edge_files: List[str], prefix: str, iteration: int,
                        checkpoint, single_files, pair_files,
                        inter_pair_files, ctg_count: int = 0,
                        scf_count: int = 0) -> dict:
    checkpoint(f"Iteration={iteration}")
    total_reads = dataset.size()
    used_reads = 0
    for i in range(1, iteration):
        used_reads += dataset.load_used_reads(
            f"{prefix}_UsedReads_{i}.txt")
    if used_reads > params.max_reads_used * total_reads:
        return {"continue": False, "ctg_count": 0, "scf_count": 0}

    # --- phase 0: per-partition simplification + load + contract ----------
    graph = FullGraph(dataset, params)
    for i, ef in enumerate(edge_files):
        out = f"{prefix}_{i}_ParSimpleEdges.txt"
        if not os.path.exists(out):
            parsimplify(ef, out, params.min_ovl, 1)
        graph.read_par_edges(out)
    graph.sort_edges_by_dest()
    while graph.contract_composite_par() > 0:
        pass
    graph.print_all_edges(f"{prefix}_phase_parsimplify_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint("ParSimplify=1")

    # --- phase 1: initial simplification -----------------------------------
    graph.graph_path_find_initial()
    graph.print_all_edges(f"{prefix}_phase_initial_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint("InitialSimplify=1")

    # --- phase 2: aggressive simplification ---------------------------------
    graph.simplify_graph()
    graph.print_all_edges(f"{prefix}_phase_aggressive_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint("AggressiveSimplify=1")

    # --- phase 3: flow analysis --------------------------------------------
    graph.calculate_flow(dimacs_dump=f"{prefix}_dimacs_dump.txt")
    graph.remove_edges_without_flow()
    graph.print_all_edges(f"{prefix}_phase_flow_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint("FlowAnalysis=1")

    # --- phase 4: post-flow simplification ----------------------------------
    graph.simplify_graph()
    graph.print_all_edges(f"{prefix}_phase_postflow_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint("PostFlowAnalysis=1")

    from . import scaffold as _scaffold
    from . import contigs as _contigs

    # --- phase 5: contigs (reference: main.cpp:186-205) ---------------------
    if params.print_contigs:
        size = dataset.size()
        use_thresh = (size in _contigs.REF_THRESH
                      or size // 1_000_000 in _contigs.REF_THRESH)
        stream = (_contigs.stream_contigs_thresh if use_thresh
                  else _contigs.stream_contigs)
        ctg_count = stream(
            graph, single_files, pair_files, inter_pair_files,
            f"{prefix}_contigsFinal_{iteration}.fasta",
            f"{prefix}_contigEdgesFinal_{iteration}.txt",
            f"{prefix}_contigEdgeCoverageFinal_{iteration}.txt",
            f"{prefix}_UsedReads_{iteration}.txt",
            "contig", ctg_count)
        graph.print_all_edges(f"{prefix}_phase_printctg_{iteration}.txt")
        graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
        checkpoint(f"PrintCtg={ctg_count}")

    # --- phase 6: scaffolding ----------------------------------------------
    _scaffold.scaffold_phase(graph)
    if params.print_scaffolds:
        scf_count = _contigs.stream_contigs(
            graph, single_files, pair_files, inter_pair_files,
            f"{prefix}_scaffoldsFinal_{iteration}.fasta",
            f"{prefix}_scaffoldEdgesFinal_{iteration}.txt",
            f"{prefix}_scaffoldEdgeCoverageFinal_{iteration}.txt",
            f"{prefix}_UsedReads_{iteration}.txt",
            "scaff", scf_count)
    graph.print_all_edges(f"{prefix}_phase_scaffold_{iteration}.txt")
    graph.print_all_edges(f"{prefix}_CurrGraph_.txt")
    checkpoint(f"Scaffold={scf_count}")

    # --- used-read accounting (main.cpp:273-291) ---------------------------
    used = 0
    for i in range(1, dataset.size() + 1):
        if dataset.used[i]:
            used += dataset.recursive_contained_count(i) + 1
    cont = used <= params.max_reads_used * total_reads
    return {"continue": cont, "ctg_count": ctg_count,
            "scf_count": scf_count}
