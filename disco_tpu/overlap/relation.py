"""Full overlap/containment relation computation.

For every read r1 and window j in [0, len1-k) (the reference's substring loop,
reference: src/BuildGraph/src/OverlapGraph.cpp:401,638), look up the window's
(k=minOverlap-1)-mer in the fingerprint table and verify each hit:

- containment check (reference: OverlapGraph.cpp:517-554): read2 lies entirely
  within read1 — windows of length len2;
- edge check (reference: OverlapGraph.cpp:567-595): suffix-prefix overlap that
  extends to the reads' ends — only j >= 1 qualifies
  (reference: OverlapGraph.cpp:638 starts the edge loop at j=1).

The relation is ORDER-COMPLETE: hits per (r1, j) are sorted by
(read2, record-type), which equals the reference's hash-bucket scan order
(file order), so the sequential replay in `disco_tpu.buildg` can reproduce
the reference's outputs bit-for-bit. Unlike the reference, candidate
verification itself is order-free and runs as one big device batch.
"""
from dataclasses import dataclass

import numpy as np

from ..index.table import FingerprintTable
from ..io.readstore import ReadStore
from . import verify as _verify

# Orientation tables, indexed by hit orientation 0..3
# (reference: src/BuildGraph/src/OverlapGraph.cpp:428-433,660-666)
_EDGE_ORIENT = np.array([3, 0, 2, 1], np.int8)   # hit orient -> edge orient
_IS_SUFFIX_CASE = np.array([0, 1, 0, 1], np.bool_)  # orient 1/3: match at s2 end
_USE_RC = np.array([0, 0, 1, 1], np.bool_)       # orient 2/3: s2 = rc(read2)


@dataclass
class OverlapRelation:
    """Struct-of-arrays of verified hits, sorted by (r1, j, r2, typ).

    r1, r2 : int32, 0-based read indices
    j      : int32 window start in read1 (reference's substring position)
    orient : int8 hit orientation (0..3, table semantics)
    typ    : int8 table record type (0 prefix, 1 suffix) — tie-break order
    cont_ok: bool — read2 contained in read1 at this hit
    edge_ok: bool — proper suffix-prefix overlap at this hit (j>=1 enforced)
    """
    r1: np.ndarray
    j: np.ndarray
    r2: np.ndarray
    orient: np.ndarray
    typ: np.ndarray
    cont_ok: np.ndarray
    edge_ok: np.ndarray
    k: int

    def __len__(self):
        return len(self.r1)


def window_codes(store: ReadStore, k: int):
    """Return (qread, qj, qcode): one query per (read, window j in [0,len-k)).
    Codes are the first min(k,32) bases of each window, packed uint64."""
    kk = min(k, 32)
    n = store.n_reads
    lens = store.lengths.astype(np.int64)
    n_win = lens - k  # windows j in [0, len-k)
    if (n_win <= 0).any():
        raise ValueError("read shorter than min overlap")
    qread = np.repeat(np.arange(n, dtype=np.int32), n_win)
    offs = np.concatenate([np.arange(c, dtype=np.int64) for c in n_win])
    qj = offs.astype(np.int32)

    # base codes matrix on demand (host); rolling-code per row
    # code[j] = bases[j .. j+kk) packed big-endian 2-bit
    maxlen = store.max_len
    words = store.packed
    # unpack all bases once: (N, maxlen) uint8
    t = np.arange(maxlen)
    shifts = (30 - 2 * (t % 16)).astype(np.uint32)
    bases = ((words[:, t // 16] >> shifts) & np.uint32(3)).astype(np.uint8)

    # rolling code along axis 1
    codes = np.zeros((n, maxlen), np.uint64)
    acc = np.zeros(n, np.uint64)
    mask = np.uint64((1 << (2 * kk)) - 1) if kk < 32 else np.uint64(0xFFFFFFFFFFFFFFFF)
    for pos in range(maxlen):
        acc = ((acc << np.uint64(2)) | bases[:, pos].astype(np.uint64)) & mask
        if pos >= kk - 1:
            codes[:, pos - kk + 1] = acc
    qcode = codes[qread, qj]
    return qread, qj, qcode


def compute_relation(store: ReadStore, table: FingerprintTable,
                     chunk: int = 1 << 20) -> OverlapRelation:
    k = table.k
    qread, qj, qcode = window_codes(store, k)
    lo, hi = table.lookup_ranges(qcode)
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())

    pair_q = np.repeat(np.arange(len(qread), dtype=np.int64), counts)
    # intra-group rank
    cum = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(total, dtype=np.int64) - cum[pair_q]
    tpos = lo[pair_q] + rank

    r1 = qread[pair_q]
    j = qj[pair_q]
    r2 = table.read[tpos]
    orient = table.orient[tpos]
    typ = table.typ[tpos]

    len1 = store.lengths[r1].astype(np.int32)
    len2 = store.lengths[r2].astype(np.int32)
    suffix_case = _IS_SUFFIX_CASE[orient]
    use_rc = _USE_RC[orient]

    # ---- window geometry -------------------------------------------------
    # edge (reference: OverlapGraph.cpp:567-595)
    e_valid = np.where(suffix_case,
                       j <= len2 - k,                # orient 1/3
                       (len1 - j) < len2)            # orient 0/2 must extend
    e_valid &= (j >= 1) & (r1 != r2)
    e_n = np.where(suffix_case, j + k, len1 - j).astype(np.int32)
    e_o1 = np.where(suffix_case, 0, j).astype(np.int32)
    e_o2 = np.where(suffix_case, len2 - e_n, 0).astype(np.int32)

    # containment (reference: OverlapGraph.cpp:517-554)
    c_valid = np.where(suffix_case, j >= len2 - k, j + len2 <= len1)
    c_valid &= r1 != r2
    c_n = len2.astype(np.int32)
    c_o1 = np.where(suffix_case, j + k - len2, j).astype(np.int32)
    c_o2 = np.zeros_like(c_o1)

    # ---- device verification (both checks in one batch) ------------------
    n = store.n_reads
    packed_all = _verify.make_packed_all(store.packed, store.packed_rc)
    rows2 = (r2 + np.where(use_rc, n, 0)).astype(np.int32)

    def run(o1, o2, nlen, valid):
        out = np.zeros(total, np.bool_)
        nlen = np.where(valid, nlen, 0)  # invalid -> zero-length (True), mask after
        for s in range(0, total, chunk):
            e = min(s + chunk, total)
            ok = _verify.verify_windows(
                packed_all, r1[s:e].astype(np.int32), rows2[s:e],
                o1[s:e], o2[s:e], nlen[s:e], n_words=store.n_words)
            out[s:e] = np.asarray(ok)
        return out & valid

    edge_ok = run(e_o1, e_o2, e_n, e_valid)
    cont_ok = run(c_o1, c_o2, c_n, c_valid)

    keep = edge_ok | cont_ok
    # hits per (r1, j) ordered like the reference's bucket scan: by the
    # candidate's FILE index (insertion order), prefix record first
    fidx2 = store.file_index[r2[keep]]
    order = np.lexsort((typ[keep], fidx2, j[keep], r1[keep]))

    def sel(a):
        return a[keep][order]

    return OverlapRelation(
        r1=sel(r1).astype(np.int32), j=sel(j), r2=sel(r2).astype(np.int32),
        orient=sel(orient), typ=sel(typ),
        cont_ok=sel(cont_ok), edge_ok=sel(edge_ok), k=k)
