// Native host overlap-relation kernel (OpenMP).
//
// Computes the same verified overlap/containment relation as the
// XLA/numpy path in disco_tpu/overlap/relation.py: for every read r1 and
// window j in [0, len1-k), look the window's (k)-mer key up in the sorted
// canonical fingerprint table and verify every bucket entry with 2-bit
// packed-word compares (the reference does this with byte-wise
// std::string::substr equality inside chained hash buckets,
// reference: src/BuildGraph/src/OverlapGraph.cpp:401-478,631-674,
// HashTable.cpp:521-571).
//
// Emission order is the relation's required order by construction:
// reads ascending, window j ascending, and within a bucket the table's
// (file-index, record-type) sort order.
//
// Single-pass protocol: reads are split into fixed contiguous blocks;
// threads claim blocks dynamically and append verified hits to the block's
// own buffer, so concatenating buffers in block order is bit-deterministic
// for any thread count (collect returns an opaque handle + total, export
// copies the columns out and frees).  A count+fill two-pass design would
// verify every candidate twice — verification IS the kernel's cost.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// word covering bases [off + 16*wi, +16) of a packed row (funnel shift;
// mirrors disco_tpu/overlap/verify.py::_window_word)
static inline uint32_t window_word(const uint32_t* row, int64_t off,
                                   int64_t wi) {
  const int64_t word_idx = off / 16 + wi;
  const uint32_t bit = 2u * static_cast<uint32_t>(off % 16);
  const uint32_t w0 = row[word_idx];
  const uint32_t w1 = row[word_idx + 1];
  if (bit == 0) return w0;
  return (w0 << bit) | (w1 >> (32u - bit));
}

// fwd-row window [o1, o1+n) == other-row window [o2, o2+n) ?
static inline bool windows_equal(const uint32_t* row1, int64_t o1,
                                 const uint32_t* row2, int64_t o2,
                                 int64_t n) {
  for (int64_t wi = 0; n > 0; ++wi, n -= 16) {
    const uint32_t x = window_word(row1, o1, wi);
    const uint32_t y = window_word(row2, o2, wi);
    const uint32_t mask =
        (n >= 16) ? 0xFFFFFFFFu : (0xFFFFFFFFu << (2u * (16u - (uint32_t)n)));
    if ((x ^ y) & mask) return false;
  }
  return true;
}

struct Table {
  const uint64_t* keys;
  const int32_t* read;
  const int8_t* orient;
  const int8_t* typ;
  int64_t m;
  // top-RBITS radix index narrowing the binary search range.  RBITS is
  // sized to ~4 buckets per entry so the index (uint32 slots) stays small
  // enough to live in the last-level cache — the per-window lookup is one
  // random load into this array, and with most windows being misses that
  // load dominates the kernel when the index spills to DRAM.
  int rbits = 16;
  int rshift = 48;
  std::vector<uint32_t> radix;

  void build_radix() {
    int b = 16;
    while (b < 24 && (int64_t(1) << b) < 4 * m) ++b;
    rbits = b;
    rshift = 64 - b;
    radix.assign((int64_t(1) << b) + 1, 0);
    int64_t pos = 0;
    for (int64_t p = 0; p <= (int64_t(1) << b); ++p) {
      while (pos < m && (keys[pos] >> rshift) < static_cast<uint64_t>(p))
        ++pos;
      radix[p] = static_cast<uint32_t>(pos);
    }
  }

  inline void lookup(uint64_t q, int64_t* lo_out, int64_t* hi_out) const {
    const int64_t p = static_cast<int64_t>(q >> rshift);
    int64_t lo = radix[p], hi = radix[p + 1];
    if (lo == hi) {
      *lo_out = lo;
      *hi_out = hi;
      return;
    }
    // lower_bound
    int64_t a = lo, b = hi;
    while (a < b) {
      const int64_t mid = (a + b) >> 1;
      if (keys[mid] < q) a = mid + 1; else b = mid;
    }
    *lo_out = a;
    // upper_bound
    b = hi;
    while (a < b) {
      const int64_t mid = (a + b) >> 1;
      if (keys[mid] <= q) a = mid + 1; else b = mid;
    }
    *hi_out = a;
  }
};

struct Hit {
  int32_t r1, j, r2;
  int8_t orient, typ;
  uint8_t cont, edge;
};

struct Collected {
  std::vector<std::vector<Hit>> blocks;
};

constexpr int64_t kBlockReads = 2048;

}  // namespace

extern "C" {

// Scans all (read, window) queries, verifies candidates, and stores hits
// grouped by contiguous read blocks.  Returns an opaque handle; *total_out
// is the hit count.  Call overlap_relation_export exactly once to copy the
// columns out and free the handle.
void* overlap_relation_collect(
    const uint32_t* packed, const uint32_t* packed_rc, const int32_t* lengths,
    int64_t n, int64_t row_words, const uint64_t* keys, const int32_t* tread,
    const int8_t* torient, const int8_t* ttyp, int64_t m, int64_t k,
    int64_t* total_out) {
  Table t;
  t.keys = keys;
  t.read = tread;
  t.orient = torient;
  t.typ = ttyp;
  t.m = m;
  t.build_radix();

  const int64_t kk = (k < 32) ? k : 32;
  const int64_t key_shift = 64 - 2 * kk;

  auto* col = new Collected();
  const int64_t n_blocks = (n + kBlockReads - 1) / kBlockReads;
  col->blocks.resize(static_cast<size_t>(n_blocks));

#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t bi = 0; bi < n_blocks; ++bi) {
    std::vector<Hit>& out = col->blocks[bi];
    const int64_t r_end = ((bi + 1) * kBlockReads < n) ? (bi + 1) * kBlockReads
                                                       : n;
    // per-read window-code scratch; chunked so long reads stay bounded
    constexpr int64_t kWinChunk = 512;
    uint64_t qcodes[kWinChunk];
    for (int64_t r1 = bi * kBlockReads; r1 < r_end; ++r1) {
      const uint32_t* row1 = packed + r1 * row_words;
      const int64_t len1 = lengths[r1];
      const int64_t n_win = len1 - k;
      for (int64_t jc = 0; jc < n_win; jc += kWinChunk) {
      const int64_t j_end = (jc + kWinChunk < n_win) ? jc + kWinChunk : n_win;
      // pass 1: compute the chunk's window codes and prefetch their radix
      // slots — the random load into the (tens-of-MB) radix index is the
      // dominant stall of this kernel; batching hides it
      for (int64_t j = jc; j < j_end; ++j) {
        // window code: first kk bases of window j, packed into the top bits
        const int64_t wbase = j / 16;
        const uint32_t phase = 2u * static_cast<uint32_t>(j % 16);
        const uint64_t w0 = row1[wbase];
        const uint64_t w1 = row1[wbase + 1];
        // row has a trailing zero word; wbase+2 may step past it for j near
        // the end of a max-length read, so clamp like the XLA path does
        const int64_t i2 = (wbase + 2 < row_words) ? wbase + 2 : row_words - 1;
        const uint64_t w2 = row1[i2];
        const uint64_t hi = (w0 << 32) | w1;
        const uint64_t win =
            (phase == 0) ? hi : (hi << phase) | (w2 >> (32u - phase));
        const uint64_t qcode = win >> key_shift;
        qcodes[j - jc] = qcode;
        __builtin_prefetch(&t.radix[qcode >> t.rshift], 0, 0);
      }
      // pass 2: lookups + verification
      for (int64_t j = jc; j < j_end; ++j) {
        const uint64_t qcode = qcodes[j - jc];
        int64_t lo, hiix;
        t.lookup(qcode, &lo, &hiix);
        for (int64_t p = lo; p < hiix; ++p) {
          const int64_t r2 = t.read[p];
          if (r2 == r1) continue;
          const int32_t ho = t.orient[p];
          const int64_t len2 = lengths[r2];
          const bool suffix_case = (ho == 1) || (ho == 3);
          const uint32_t* row2 =
              ((ho == 2) || (ho == 3)) ? packed_rc + r2 * row_words
                                       : packed + r2 * row_words;
          // edge: proper suffix-prefix overlap extending to both ends
          // (reference: OverlapGraph.cpp:567-595)
          bool edge_ok = false;
          if (j >= 1 &&
              (suffix_case ? (j <= len2 - k) : (len1 - j < len2))) {
            const int64_t en = suffix_case ? j + k : len1 - j;
            const int64_t eo1 = suffix_case ? 0 : j;
            const int64_t eo2 = suffix_case ? len2 - en : 0;
            edge_ok = windows_equal(row1, eo1, row2, eo2, en);
          }
          // containment: read2 entirely inside read1
          // (reference: OverlapGraph.cpp:517-554)
          bool cont_ok = false;
          if (suffix_case ? (j >= len2 - k) : (j + len2 <= len1)) {
            const int64_t co1 = suffix_case ? j + k - len2 : j;
            cont_ok = windows_equal(row1, co1, row2, 0, len2);
          }
          if (!(edge_ok || cont_ok)) continue;
          out.push_back(Hit{static_cast<int32_t>(r1),
                            static_cast<int32_t>(j),
                            static_cast<int32_t>(r2), t.orient[p], t.typ[p],
                            static_cast<uint8_t>(cont_ok ? 1 : 0),
                            static_cast<uint8_t>(edge_ok ? 1 : 0)});
        }
      }
      }
    }
  }

  int64_t total = 0;
  for (const auto& b : col->blocks) total += static_cast<int64_t>(b.size());
  *total_out = total;
  return col;
}

// Copies the collected hits into column arrays (block order = read order)
// and frees the handle.
void overlap_relation_export(void* handle, int32_t* out_r1, int32_t* out_j,
                             int32_t* out_r2, int8_t* out_orient,
                             int8_t* out_typ, uint8_t* out_cont,
                             uint8_t* out_edge) {
  auto* col = static_cast<Collected*>(handle);
  const int64_t n_blocks = static_cast<int64_t>(col->blocks.size());
  std::vector<int64_t> offs(n_blocks + 1, 0);
  for (int64_t bi = 0; bi < n_blocks; ++bi)
    offs[bi + 1] = offs[bi] + static_cast<int64_t>(col->blocks[bi].size());
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t bi = 0; bi < n_blocks; ++bi) {
    int64_t slot = offs[bi];
    for (const Hit& h : col->blocks[bi]) {
      out_r1[slot] = h.r1;
      out_j[slot] = h.j;
      out_r2[slot] = h.r2;
      out_orient[slot] = h.orient;
      out_typ[slot] = h.typ;
      out_cont[slot] = h.cont;
      out_edge[slot] = h.edge;
      ++slot;
    }
  }
  delete col;
}

}  // extern "C"
