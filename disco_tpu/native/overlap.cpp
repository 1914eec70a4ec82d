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
// (file-index, record-type) sort order — no post-sort needed.
//
// Two-pass protocol (pass 0 counts per read, host prefix-sums, pass 1
// fills), each pass parallel over reads; the output is bit-deterministic
// for any thread count because every read owns a disjoint output slice.
#include <cstdint>
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
  // top-RBITS radix index narrowing the binary search range; at 24 bits a
  // multi-million-entry table averages <1 entry per radix bucket, so most
  // window lookups (the vast majority are misses) cost one indexed load
  static constexpr int RBITS = 24;
  static constexpr int RSHIFT = 64 - RBITS;
  std::vector<int64_t> radix;

  void build_radix() {
    radix.assign((int64_t(1) << RBITS) + 1, 0);
    int64_t pos = 0;
    for (int64_t p = 0; p <= (int64_t(1) << RBITS); ++p) {
      while (pos < m && (keys[pos] >> RSHIFT) < static_cast<uint64_t>(p))
        ++pos;
      radix[p] = pos;
    }
  }

  inline void lookup(uint64_t q, int64_t* lo_out, int64_t* hi_out) const {
    const int64_t p = static_cast<int64_t>(q >> RSHIFT);
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

}  // namespace

extern "C" {

// pass 0: out_counts[r] = number of kept hits of read r (other outputs may
//         be null).
// pass 1: offsets[r] = start slot of read r (host-computed prefix sums);
//         fills out_* arrays.
void overlap_relation(const uint32_t* packed, const uint32_t* packed_rc,
                      const int32_t* lengths, int64_t n, int64_t row_words,
                      const uint64_t* keys, const int32_t* tread,
                      const int8_t* torient, const int8_t* ttyp, int64_t m,
                      int64_t k, int64_t pass, int64_t* counts_or_offsets,
                      int32_t* out_r1, int32_t* out_j, int32_t* out_r2,
                      int8_t* out_orient, int8_t* out_typ, uint8_t* out_cont,
                      uint8_t* out_edge) {
  Table t;
  t.keys = keys;
  t.read = tread;
  t.orient = torient;
  t.typ = ttyp;
  t.m = m;
  t.build_radix();

  const int64_t kk = (k < 32) ? k : 32;
  const int64_t key_shift = 64 - 2 * kk;

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t r1 = 0; r1 < n; ++r1) {
    const uint32_t* row1 = packed + r1 * row_words;
    const int64_t len1 = lengths[r1];
    int64_t slot = (pass == 1) ? counts_or_offsets[r1] : 0;
    int64_t count = 0;
    for (int64_t j = 0; j < len1 - k; ++j) {
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
        if (pass == 1) {
          out_r1[slot] = static_cast<int32_t>(r1);
          out_j[slot] = static_cast<int32_t>(j);
          out_r2[slot] = static_cast<int32_t>(r2);
          out_orient[slot] = t.orient[p];
          out_typ[slot] = t.typ[p];
          out_cont[slot] = cont_ok ? 1 : 0;
          out_edge[slot] = edge_ok ? 1 : 0;
          ++slot;
        } else {
          ++count;
        }
      }
    }
    if (pass == 0) counts_or_offsets[r1] = count;
  }
}

}  // extern "C"
