// Read QC + 2-bit packing, native host path.
// Exact behavioral port of disco_tpu/io/readqc.py::test_read (itself a port
// of the reference's Dataset::testRead,
// reference: src/BuildGraph/src/Dataset.cpp:403-451, filter strings :48-85,
// mer table :87, non-overlapping counting Common.h:173-183) and of
// disco_tpu/utils/dna.py::pack_codes (A=0 C=1 G=2 T=3, 16 bases per uint32,
// big-endian within the word; reference packing direction:
// src/BuildGraph/src/HashTable.cpp:456-477).
#include <cstdint>
#include <cstring>

namespace {

constexpr int64_t MIN_READ_SIZE = 30;

const char* const FILTER_STRINGS[] = {
    "ACACACACACACACACACACACACACACA", "AGAGAGAGAGAGAGAGAGAGAGAGAGAGA",
    "ATATATATATATATATATATATATATATA", "CGCGCGCGCGCGCGCGCGCGCGCGCGCGC",
    "CTCTCTCTCTCTCTCTCTCTCTCTCTCTC", "AAGAAGAAGAAGAAGAAGAAGAAGAAGAA",
    "ATAATAATAATAATAATAATAATAATAAT", "TAATAATAATAATAATAATAATAATAATA",
    "AACAACAACAACAACAACAACAACAACAA", "ACAACAACAACAACAACAACAACAACAAC",
    "CAACAACAACAACAACAACAACAACAACA", "AAGAAGAAGAAGAAGAAGAAGAAGAAGAA",
    "AGAAGAAGAAGAAGAAGAAGAAGAAGAAG", "GAAGAAGAAGAAGAAGAAGAAGAAGAAGA",
    "TTCTTCTTCTTCTTCTTCTTCTTCTTCTT", "AAATAAATAAATAAATAAATAAATAAATA",
    "TAAATAAATAAATAAATAAATAAATAAAT", "ATAAATAAATAAATAAATAAATAAATAAA",
    "AATAAATAAATAAATAAATAAATAAATAA", "AATTAATTAATTAATTAATTAATTAATTA",
    "ATTAATTAATTAATTAATTAATTAATTAA", "TTAATTAATTAATTAATTAATTAATTAAT",
    "TAATTAATTAATTAATTAATTAATTAATT", "AAAGAAAGAAAGAAAGAAAGAAAGAAAGA",
    "AAAGAAAGAAAGAAAGAAAGAAAGAAAGA", "AGAAAGAAAGAAAGAAAGAAAGAAAGAAA",
    "GAAAGAAAGAAAGAAAGAAAGAAAGAAAG", "TACATACATACATACATACATACATACAT",
    "ACATACATACATACATACATACATACATA", "CATACATACATACATACATACATACATAC",
    "ATACATACATACATACATACATACATACA", "GTTTGTTTGTTTGTTTGTTTGTTTGTTTG",
    "TGTTTGTTTGTTTGTTTGTTTGTTTGTTT", "TTTGTTTGTTTGTTTGTTTGTTTGTTTGT",
    "AGGGAGGGAGGGAGGGAGGGAGGGAGGGA", "GAGGGAGGGAGGGAGGGAGGGAGGGAGGG",
    "GGAGGGAGGGAGGGAGGGAGGGAGGGAGG", "GGGAGGGAGGGAGGGAGGGAGGGAGGGAG",
};
constexpr int N_FILTER = sizeof(FILTER_STRINGS) / sizeof(FILTER_STRINGS[0]);

const char* const MER_STRINGS[] = {
    "AC", "AG", "AT", "CG", "CT", "GT",
    "AAT", "ATA", "TAA", "AAC", "ACA", "CAA",
    "AAG", "AGA", "GAA", "GGGGCC",
};
constexpr int N_MER = sizeof(MER_STRINGS) / sizeof(MER_STRINGS[0]);

// non-overlapping occurrence count (reference: Common.h:173-183)
inline int64_t count_nonoverlap(const char* s, int64_t n, const char* sub,
                                int64_t m) {
  int64_t count = 0, i = 0;
  while (i + m <= n) {
    if (std::memcmp(s + i, sub, m) == 0) {
      ++count;
      i += m;
    } else {
      ++i;
    }
  }
  return count;
}

inline int code_of(unsigned char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return -1;
  }
}

inline bool test_read(const char* s, int64_t n, int64_t min_overlap) {
  if (n <= min_overlap || n < MIN_READ_SIZE) return false;
  int64_t counts[4] = {0, 0, 0, 0};
  for (int64_t i = 0; i < n; ++i) {
    int c = code_of(static_cast<unsigned char>(s[i]));
    if (c < 0) return false;
    ++counts[c];
  }
  int64_t maxc = counts[0];
  for (int k = 1; k < 4; ++k)
    if (counts[k] > maxc) maxc = counts[k];
  if (maxc >= static_cast<int64_t>(n * 0.7)) return false;
  for (int f = 0; f < N_FILTER; ++f) {
    const char* fs = FILTER_STRINGS[f];
    int64_t m = static_cast<int64_t>(std::strlen(fs));
    if (n < m) return false;
    if (std::memcmp(s, fs, m) == 0 || std::memcmp(s + n - m, fs, m) == 0)
      return false;
  }
  int64_t half = static_cast<int64_t>(n * 0.5);
  for (int f = 0; f < N_MER; ++f) {
    const char* mer = MER_STRINGS[f];
    int64_t m = static_cast<int64_t>(std::strlen(mer));
    if (count_nonoverlap(s, n, mer, m) * m >= half) return false;
  }
  return true;
}

}  // namespace

extern "C" void qc_test_reads(const char* data, const int64_t* offsets,
                              int64_t n, int64_t min_overlap, uint8_t* out) {
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = 0; i < n; ++i)
    out[i] = test_read(data + offsets[i], offsets[i + 1] - offsets[i],
                       min_overlap) ? 1 : 0;
}

// Pack reads into (n, n_words+1) uint32 rows (last word zero pad), forward
// and reverse-complement.  Returns the index of the first read containing a
// non-ACGT base, or -1 on success.  `order` (may be null for identity)
// selects which record lands in each output row: row i <- record order[i].
extern "C" int64_t pack_reads_ordered(const char* data,
                                      const int64_t* offsets,
                                      const int64_t* order, int64_t n,
                                      int64_t n_words, uint32_t* packed,
                                      uint32_t* packed_rc) {
  const int64_t stride = n_words + 1;
  int64_t bad = -1;
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t rec = order ? order[i] : i;
    const char* s = data + offsets[rec];
    const int64_t len = offsets[rec + 1] - offsets[rec];
    uint32_t* pf = packed + i * stride;
    uint32_t* pr = packed_rc + i * stride;
    std::memset(pf, 0, stride * sizeof(uint32_t));
    std::memset(pr, 0, stride * sizeof(uint32_t));
    for (int64_t j = 0; j < len; ++j) {
      int c = code_of(static_cast<unsigned char>(s[j]));
      if (c < 0) {
#pragma omp critical
        if (bad < 0 || i < bad) bad = i;
        break;
      }
      pf[j >> 4] |= static_cast<uint32_t>(c) << (30 - 2 * (j & 15));
      int64_t rj = len - 1 - j;  // rc position of base j
      pr[rj >> 4] |= static_cast<uint32_t>(3 - c) << (30 - 2 * (rj & 15));
    }
  }
  return bad;
}
