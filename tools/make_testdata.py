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
    ap.add_argument("--error-rate", type=float, default=0.0,
                    help="per-base substitution probability: error reads "
                         "form dead-end branches that iteration 1 deletes, "
                         "leaving unused edges that reload in iterations "
                         "2-3 (exercises the reference's isUsedEdge skip, "
                         "src/SimplifyGraph/src/OverlapGraph.cpp:2098-2136)")
    ap.add_argument("--noise-frac", type=float, default=0.0,
                    help="fraction of extra pairs drawn from unique random "
                         "fragments (never overlap anything): keeps the "
                         "used-read fraction after iteration 1 below "
                         "maxReadsUsed so the reference's simplification "
                         "iterations 2-3 run (reference: "
                         "src/SimplifyGraph/src/main.cpp:79-93,296-314)")
    ap.add_argument("--islets", type=int, default=0,
                    help="N tiny independent high-coverage sequence islets "
                         "(like low-abundance organisms' covered fragments). "
                         "Dense sub-300bp chains are unprinted (hence "
                         "unused) in iteration 1 yet survive iteration 2-3 "
                         "dead-end removal (>=20/>=10 inner reads), giving "
                         "the later iterations a real non-empty graph")
    ap.add_argument("--islet-len", type=int, default=290)
    ap.add_argument("--islet-cov", type=float, default=18.0)
    ap.add_argument("--fastq", action="store_true",
                    help="emit FASTQ (4-line records, constant quality) "
                         "instead of FASTA")
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
    for i in range(args.islets):
        seq = BASES[rng.integers(0, 4, size=args.islet_len)].tobytes().decode()
        genomes.append(seq)
        n_pairs = max(1, int(args.islet_len * args.islet_cov
                             / (2 * args.read_len)))
        # variable short inserts so read start positions spread over the
        # islet instead of stacking as duplicates
        ins = rng.integers(args.read_len + 10, args.islet_len + 1,
                           size=n_pairs)
        st = rng.integers(0, args.islet_len - ins + 1)
        gidx.append(np.full(n_pairs, args.n_genomes + i))
        starts_l.append(st)
        inserts_l.append(ins)
    gidx = np.concatenate(gidx)
    starts = np.concatenate(starts_l)
    inserts = np.concatenate(inserts_l)
    noise_frags = []
    if args.noise_frac > 0:
        n_noise = int(round(len(gidx) * args.noise_frac
                            / (1.0 - args.noise_frac)))
        ins = np.clip(
            rng.normal(args.insert, args.insert_sd, size=n_noise).astype(int),
            args.read_len + 10, None)
        for ln in ins:
            noise_frags.append(
                BASES[rng.integers(0, 4, size=ln)].tobytes().decode())
        # noise pair g marks index into noise_frags via -(i+1)
        gidx = np.concatenate([gidx, -np.arange(1, n_noise + 1)])
        starts = np.concatenate([starts, np.zeros(n_noise, dtype=starts.dtype)])
        inserts = np.concatenate([inserts, ins])
    if args.n_genomes > 1 or noise_frags or args.islets:
        perm = rng.permutation(len(gidx))
        gidx, starts, inserts = gidx[perm], starts[perm], inserts[perm]

    def add_errors(read):
        if args.error_rate <= 0:
            return read
        arr = np.frombuffer(read.encode(), dtype=np.uint8).copy()
        hits = np.nonzero(rng.random(len(arr)) < args.error_rate)[0]
        if len(hits):
            # substitute with a DIFFERENT base: old code + 1..3 mod 4
            codes = np.zeros(256, np.uint8)
            codes[BASES] = np.arange(4)
            newc = (codes[arr[hits]] + rng.integers(1, 4, len(hits))) % 4
            arr[hits] = BASES[newc]
        return arr.tobytes().decode()

    def rec(f, name, seq):
        if args.fastq:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
        else:
            f.write(f">{name}\n{seq}\n")

    with open(args.out, "w") as f:
        rid = 0
        for g, s, ins in zip(gidx, starts, inserts):
            frag = (noise_frags[-g - 1] if g < 0
                    else genomes[g][s:s + ins])
            r1 = add_errors(frag[:args.read_len])
            r2 = add_errors(revcomp(frag[-args.read_len:]))
            if args.single_end:
                rid += 1
                rec(f, f"r{rid} g={g} pos={s}", r1)
                continue
            rid += 1
            rec(f, f"r{rid}/1 g={g} pos={s}", r1)
            rid += 1
            rec(f, f"r{rid}/2 g={g} pos={s}", r2)
    print(f"wrote {args.out}: genomes={args.n_genomes}x{args.genome_len}bp "
          f"pairs={len(gidx)} readlen={args.read_len}")


if __name__ == "__main__":
    main()
