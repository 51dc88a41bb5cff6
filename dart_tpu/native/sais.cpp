// Suffix-array construction via SA-IS (Nong, Zhang & Chan 2009),
// 64-bit indices, written from the published algorithm description.
// Used by the dart_tpu index builder to derive the BWT/FM-index
// (the reference derives it with a block-incremental BWT-SW variant,
// /root/reference/src/BWT_Index/bwt_gen.c; the resulting BWT is
// identical because the BWT is unique given the text).
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

template <typename Char>
void sais_impl(const Char* T, int64_t* SA, int64_t n, int64_t K) {
  if (n == 0) return;
  if (n == 1) { SA[0] = 0; return; }

  std::vector<uint8_t> t(n);  // 1 = S-type, 0 = L-type
  t[n - 1] = 1;               // sentinel position is S
  for (int64_t i = n - 2; i >= 0; --i)
    t[i] = (T[i] < T[i + 1] || (T[i] == T[i + 1] && t[i + 1])) ? 1 : 0;
  auto isLMS = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> C(K + 1), B(K + 1);
  for (int64_t i = 0; i < n; ++i) C[T[i]]++;
  auto getStarts = [&]() {
    int64_t s = 0;
    for (int64_t c = 0; c <= K; ++c) { B[c] = s; s += C[c]; }
  };
  auto getEnds = [&]() {
    int64_t s = 0;
    for (int64_t c = 0; c <= K; ++c) { s += C[c]; B[c] = s; }
  };

  auto induceSAl = [&]() {
    getStarts();
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = SA[i];
      if (j > 0 && !t[j - 1]) SA[B[T[j - 1]]++] = j - 1;
    }
  };
  auto induceSAs = [&]() {
    getEnds();
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = SA[i];
      if (j > 0 && t[j - 1]) SA[--B[T[j - 1]]] = j - 1;
    }
  };

  // Stage 1: sort LMS substrings by one round of induced sorting.
  std::fill(SA, SA + n, (int64_t)-1);
  getEnds();
  for (int64_t i = n - 1; i >= 1; --i)
    if (isLMS(i)) SA[--B[T[i]]] = i;
  induceSAl();
  induceSAs();

  // Compact the sorted LMS positions into SA[0..n1).
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (isLMS(SA[i])) SA[n1++] = SA[i];

  // Name LMS substrings into the upper half of SA.
  std::fill(SA + n1, SA + n, (int64_t)-1);
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = SA[i];
    bool diff = false;
    if (prev < 0) diff = true;
    else {
      for (int64_t d = 0;; ++d) {
        if (T[pos + d] != T[prev + d] || t[pos + d] != t[prev + d]) { diff = true; break; }
        if (d > 0 && (isLMS(pos + d) || isLMS(prev + d))) break;  // types equal => both LMS
      }
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // Recurse if names are not yet unique.
  int64_t* SA1 = SA;
  int64_t* s1 = SA + n - n1;
  if (name < n1) {
    sais_impl<int64_t>(s1, SA1, n1, name - 1);
  } else {
    for (int64_t i = 0; i < n1; ++i) SA1[s1[i]] = i;
  }

  // Map reduced-string ranks back to LMS text positions.
  {
    int64_t j = 0;
    for (int64_t i = 1; i < n; ++i)
      if (isLMS(i)) s1[j++] = i;
    for (int64_t i = 0; i < n1; ++i) SA1[i] = s1[SA1[i]];
  }

  // Stage 2: induce the full SA from the sorted LMS suffixes.
  std::fill(SA + n1, SA + n, (int64_t)-1);
  getEnds();
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--B[T[j]]] = j;
  }
  induceSAl();
  induceSAs();
}

}  // namespace

extern "C" {

// Suffix array of a 2-bit (or small-alphabet) text with an implicit
// smallest sentinel appended (BWA convention: "$" sorts first).
// T: n bytes with values in [0, K-1]; SA out: n entries.
// Returns 0 on success.
int64_t dart_sais_u8(const uint8_t* T, int64_t* SA, int64_t n, int64_t K) {
  if (n <= 0) return 0;
  std::vector<uint8_t> Tp((size_t)n + 1);
  for (int64_t i = 0; i < n; ++i) Tp[i] = (uint8_t)(T[i] + 1);
  Tp[n] = 0;  // sentinel
  std::vector<int64_t> SAp((size_t)n + 1);
  sais_impl<uint8_t>(Tp.data(), SAp.data(), n + 1, K);
  std::memcpy(SA, SAp.data() + 1, sizeof(int64_t) * (size_t)n);
  return 0;
}

}  // extern "C"
