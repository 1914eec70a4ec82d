#!/usr/bin/env python3
"""Deterministic synthetic read-set generator for parity/bench fixtures.

The reference repo's E. coli test reads (test/Ecoli_250_500_test.fna) are a
stripped large blob in our mount, so we regenerate equivalent inputs: a random
genome (fixed seed), error-free paired-end 250 bp reads with ~500 bp insert —
the same read geometry the missing file's name describes. Reads are emitted
interleaved (mate pairs adjacent), as Disco expects (reference:
src/BuildGraph/src/main.cpp:96 "-pe ... mate pairs should be one after
another in the file").

Usage: make_testdata.py OUT.fasta [--genome-len 200000] [--coverage 25]
       [--read-len 250] [--insert 500] [--seed 42] [--rc-second/--no-rc-second]
"""
import argparse
import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {ord('A'): 'T', ord('C'): 'G', ord('G'): 'C', ord('T'): 'A'}


def revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--genome-len", type=int, default=200_000)
    ap.add_argument("--coverage", type=float, default=25.0)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--insert", type=int, default=500)
    ap.add_argument("--insert-sd", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--single-end", action="store_true",
                    help="emit fragments as single-end reads instead of pairs")
    ap.add_argument("--n-genomes", type=int, default=1,
                    help="mock-community mode: N independent genomes of "
                         "--genome-len each, abundances following a "
                         "geometric series (BMock12/CAMI-style coverage "
                         "heterogeneity); reads are shuffled together")
    ap.add_argument("--abundance-ratio", type=float, default=0.7,
                    help="per-genome abundance decay in mock mode")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    genomes = [
        BASES[rng.integers(0, 4, size=args.genome_len)].tobytes().decode()
        for _ in range(args.n_genomes)]

    weights = np.array([args.abundance_ratio ** i
                        for i in range(args.n_genomes)])
    weights /= weights.sum()
    n_pairs_total = int(args.n_genomes * args.genome_len * args.coverage
                        / (2 * args.read_len))
    gidx = []
    starts_l = []
    inserts_l = []
    for g, w in enumerate(weights):
        n_pairs = max(1, int(n_pairs_total * w))
        ins = np.clip(
            rng.normal(args.insert, args.insert_sd, size=n_pairs).astype(int),
            args.read_len + 10, None)
        st = rng.integers(0, args.genome_len - ins.max() - 1, size=n_pairs)
        gidx.append(np.full(n_pairs, g))
        starts_l.append(st)
        inserts_l.append(ins)
    gidx = np.concatenate(gidx)
    starts = np.concatenate(starts_l)
    inserts = np.concatenate(inserts_l)
    if args.n_genomes > 1:
        perm = rng.permutation(len(gidx))
        gidx, starts, inserts = gidx[perm], starts[perm], inserts[perm]

    with open(args.out, "w") as f:
        rid = 0
        for g, s, ins in zip(gidx, starts, inserts):
            frag = genomes[g][s:s + ins]
            r1 = frag[:args.read_len]
            r2 = revcomp(frag[-args.read_len:])
            if args.single_end:
                rid += 1
                f.write(f">r{rid} g={g} pos={s}\n{r1}\n")
                continue
            rid += 1
            f.write(f">r{rid}/1 g={g} pos={s}\n{r1}\n")
            rid += 1
            f.write(f">r{rid}/2 g={g} pos={s}\n{r2}\n")
    print(f"wrote {args.out}: genomes={args.n_genomes}x{args.genome_len}bp "
          f"pairs={len(gidx)} readlen={args.read_len}")


if __name__ == "__main__":
    main()
