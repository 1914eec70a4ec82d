"""disco-tpu command line: end-to-end assembly orchestration.

Replaces the reference's bash layer (runDisco.sh:26-257): graph construction
(buildG equivalent) -> graph simplification (fullsimplify equivalent) ->
combined contig/scaffold FASTAs, with the same directory layout
(<out>/graph/<prefix>_*, <out>/assembly/<prefix>_*) and per-iteration
parameter files.

Usage:
  python -m disco_tpu assemble -inP reads.fasta -d out -o prefix \
      -p disco.cfg [-p2 ...] [-p3 ...] [-m 30] [-obg|-osg] [-resimp]
  python -m disco_tpu stats contigs.fasta
"""
import argparse
import glob
import os
import shutil
import sys


def _cfg_min_overlap(path: str, default: int = 30) -> int:
    try:
        with open(path) as f:
            for line in f:
                t = line.strip()
                if t.startswith("MinOverlap4BuildGraph") and "=" in t:
                    return int(t.split("=")[1].split()[0])
    except OSError:
        pass
    return default


def cmd_assemble(args) -> int:
    from .buildg.pipeline import run_buildg
    from .simplify.driver import run_fullsimplify

    pair_files = []
    if args.in1 and args.in2:
        pair_files = [args.in1, args.in2]
    inter_files = args.inP.split(",") if args.inP else []
    single_files = args.inS.split(",") if args.inS else []
    if not (pair_files or inter_files or single_files):
        print("No input files specified (-in1/-in2, -inP, -inS).",
              file=sys.stderr)
        return 1

    out = args.d
    os.makedirs(os.path.join(out, "graph"), exist_ok=True)
    asm_dir = os.path.join(out, "assembly")
    if os.path.isdir(asm_dir) and args.resimp:
        shutil.rmtree(asm_dir)
    os.makedirs(asm_dir, exist_ok=True)

    graph_prefix = os.path.join(out, "graph", args.o)
    asm_prefix = os.path.join(out, "assembly", args.o)
    min_ovl = _cfg_min_overlap(args.p) if args.p else args.m

    # buildG phase: interleaved + separated pairs are "paired" inputs,
    # singles are single (reference: runDisco.sh:195-257)
    if not args.osg:
        buildg_paired = inter_files + pair_files
        run_buildg(buildg_paired, single_files, graph_prefix,
                   min_overlap=min_ovl,
                   write_par_graph_size=args.write_par_graph_size)

    if not args.obg:
        edge_files = sorted(glob.glob(graph_prefix + "_*_parGraph.txt"))
        crd_files = sorted(glob.glob(graph_prefix + "_*_containedReads.txt"))
        param_files = [p for p in (args.p, args.p2 or args.p,
                                   args.p3 or args.p2 or args.p) if p]
        run_fullsimplify(single_files, pair_files, inter_files, edge_files,
                         crd_files, asm_prefix,
                         param_files=param_files or None)
        for kind in ("contigs", "scaffolds"):
            parts = sorted(glob.glob(f"{asm_prefix}_{kind}Final_*.fasta"))
            combined = f"{asm_prefix}_{kind}FinalCombined.fasta"
            with open(combined, "w") as outf:
                for p in parts:
                    with open(p) as inf:
                        shutil.copyfileobj(inf, outf)
            shutil.copy(combined, out)
    return 0


def cmd_stats(args) -> int:
    from .utils.stats import assembly_stats, format_stats
    st = assembly_stats(args.fasta, min_len=args.min_len)
    print(format_stats(st))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="disco-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("assemble", help="end-to-end assembly")
    a.add_argument("-in1", help="forward paired read file")
    a.add_argument("-in2", help="reverse paired read file")
    a.add_argument("-inP", help="interleaved paired read file(s), comma-sep")
    a.add_argument("-inS", help="single read file(s), comma-sep")
    a.add_argument("-d", required=True, help="output directory")
    a.add_argument("-o", required=True, help="output prefix")
    a.add_argument("-p", help="parameter cfg (iteration 1)")
    a.add_argument("-p2", help="parameter cfg (iteration 2)")
    a.add_argument("-p3", help="parameter cfg (iteration 3)")
    a.add_argument("-m", type=int, default=30,
                   help="min overlap for graph build (if no cfg)")
    a.add_argument("-obg", action="store_true",
                   help="only build graph, skip simplification")
    a.add_argument("-osg", action="store_true",
                   help="only simplify (graph files must exist)")
    a.add_argument("-resimp", action="store_true",
                   help="nuke previous assembly dir and re-simplify")
    a.add_argument("--write-par-graph-size", type=int, default=1000)
    a.set_defaults(fn=cmd_assemble)

    s = sub.add_parser("stats", help="assembly N50/size statistics")
    s.add_argument("fasta")
    s.add_argument("--min-len", type=int, default=0)
    s.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
