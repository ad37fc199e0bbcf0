// SA-IS suffix array construction (Nong–Zhang–Chan induced sorting),
// written from scratch for the seqlib_tpu host runtime.
//
// Role: replaces the suffix-sort step done by libbwa's `is_bwt` in the
// reference (/root/reference/src/BWAIndex.cpp:305-341).  The caller
// appends a unique smallest sentinel (value 0) at T[n-1]; all other
// symbols must be >= 1.  Output SA has length n with SA[0] = n-1
// (the sentinel suffix).
//
// Build: g++ -O3 -fPIC -shared sais.cpp -o libseqlib_native.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename CharT>
void get_buckets(const CharT* s, int64_t* bkt, int64_t n, int64_t K,
                 bool end) {
  std::memset(bkt, 0, sizeof(int64_t) * K);
  for (int64_t i = 0; i < n; i++) bkt[s[i]]++;
  int64_t sum = 0;
  for (int64_t i = 0; i < K; i++) {
    sum += bkt[i];
    bkt[i] = end ? sum : sum - bkt[i];
  }
}

template <typename CharT>
void induce_l(const uint8_t* t, int64_t* SA, const CharT* s, int64_t* bkt,
              int64_t n, int64_t K) {
  get_buckets(s, bkt, n, K, false);
  for (int64_t i = 0; i < n; i++) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && !t[j]) SA[bkt[s[j]]++] = j;
  }
}

template <typename CharT>
void induce_s(const uint8_t* t, int64_t* SA, const CharT* s, int64_t* bkt,
              int64_t n, int64_t K) {
  get_buckets(s, bkt, n, K, true);
  for (int64_t i = n - 1; i >= 0; i--) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && t[j]) SA[--bkt[s[j]]] = j;
  }
}

template <typename CharT>
void sais_core(const CharT* s, int64_t* SA, int64_t n, int64_t K) {
  if (n == 1) { SA[0] = 0; return; }
  std::vector<uint8_t> t(n);
  t[n - 1] = 1;  // sentinel is S-type
  if (n >= 2) t[n - 2] = 0;
  for (int64_t i = n - 3; i >= 0; i--)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> bkt(K);

  // stage 1: place LMS suffixes at bucket ends, induce-sort
  for (int64_t i = 0; i < n; i++) SA[i] = -1;
  get_buckets(s, bkt.data(), n, K, true);
  for (int64_t i = 1; i < n; i++)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce_l(t.data(), SA, s, bkt.data(), n, K);
  induce_s(t.data(), SA, s, bkt.data(), n, K);

  // compact sorted LMS substrings into SA[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; i++)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];
  // sentinel LMS (position n-1) sorts first
  // note: is_lms(n-1) true when t[n-2]==0, handled above since SA[0]=n-1

  // name LMS substrings
  for (int64_t i = n1; i < n; i++) SA[i] = -1;
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; i++) {
    int64_t pos = SA[i];
    bool diff = false;
    for (int64_t d = 0; d < n; d++) {
      if (prev == -1 || pos + d >= n || prev + d >= n ||
          s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
        diff = true;
        break;
      }
      if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
    }
    if (diff) { name++; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; i--)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // stage 2: recurse if names are not unique
  int64_t* SA1 = SA;
  int64_t* s1 = SA + n - n1;
  if (name < n1) {
    sais_core<int64_t>(s1, SA1, n1, name);
  } else {
    for (int64_t i = 0; i < n1; i++) SA1[s1[i]] = i;
  }

  // stage 3: induce the full SA from the sorted LMS order
  for (int64_t i = 1, j = 0; i < n; i++)
    if (is_lms(i)) s1[j++] = i;  // LMS positions in text order
  for (int64_t i = 0; i < n1; i++) SA1[i] = s1[SA1[i]];
  for (int64_t i = n1; i < n; i++) SA[i] = -1;
  get_buckets(s, bkt.data(), n, K, true);
  for (int64_t i = n1 - 1; i >= 0; i--) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  induce_l(t.data(), SA, s, bkt.data(), n, K);
  induce_s(t.data(), SA, s, bkt.data(), n, K);
}

}  // namespace

extern "C" {

// T: uint8 text of length n with T[n-1] == 0 (unique smallest sentinel),
// all other symbols in [1, 255].  SA: caller-allocated int64[n].
// Returns 0 on success.
int sais_u8(const uint8_t* T, int64_t n, int64_t* SA) {
  if (n <= 0) return -1;
  sais_core<uint8_t>(T, SA, n, 256);
  return 0;
}

}  // extern "C"
