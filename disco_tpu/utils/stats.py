"""De-novo assembly statistics (assemblyStats.py `denovo` mode equivalent;
reference: assemblyStats.py:136-300 — N80/N50/N20 defined over contigs
sorted descending, the length at which the cumulative sum first exceeds the
fraction of total)."""
from dataclasses import dataclass
from typing import Dict, List

from ..simplify.dataset import iter_fasta_seqs


@dataclass
class AssemblyStats:
    n_contigs: int = 0
    total_len: int = 0
    max_len: int = 0
    min_len: int = 0
    mean_len: float = 0.0
    n80: int = 0
    n50: int = 0
    n20: int = 0
    n50_index: int = 0
    gc_frac: float = 0.0


def _nx(frac: float, lengths_desc: List[int], total: int) -> int:
    target = total * frac
    acc = 0
    for ln in lengths_desc:
        acc += ln
        if acc > target:
            return ln
    return 0


def assembly_stats(fasta: str, min_len: int = 0) -> AssemblyStats:
    lengths: List[int] = []
    gc = 0
    total = 0
    for seq in iter_fasta_seqs(fasta):
        if len(seq) < min_len:
            continue
        lengths.append(len(seq))
        total += len(seq)
        gc += sum(1 for c in seq if c in "GCgc")
    st = AssemblyStats()
    if not lengths:
        return st
    lengths.sort(reverse=True)
    st.n_contigs = len(lengths)
    st.total_len = total
    st.max_len = lengths[0]
    st.min_len = lengths[-1]
    st.mean_len = total / len(lengths)
    st.n80 = _nx(0.8, lengths, total)
    st.n50 = _nx(0.5, lengths, total)
    st.n20 = _nx(0.2, lengths, total)
    acc = 0
    for i, ln in enumerate(lengths):
        acc += ln
        if acc > total * 0.5:
            st.n50_index = i + 1
            break
    st.gc_frac = gc / total if total else 0.0
    return st


def format_stats(st: AssemblyStats) -> str:
    return "\n".join([
        f"contigs:      {st.n_contigs}",
        f"total length: {st.total_len}",
        f"max length:   {st.max_len}",
        f"min length:   {st.min_len}",
        f"mean length:  {st.mean_len:.1f}",
        f"N80:          {st.n80}",
        f"N50:          {st.n50}",
        f"N20:          {st.n20}",
        f"N50 index:    {st.n50_index}",
        f"GC%:          {100.0 * st.gc_frac:.2f}",
    ])
