// Native graph I/O + index building for mpgnn_tpu.
//
// TPU-native counterpart of the runtime-side native surface the reference
// delegates to its dependencies (pandas CSV parsing in main.py:86-195, the
// O(E) Python dict-building loops in main.py:387-477). Device compute stays
// in JAX/XLA/Pallas; this library owns the host runtime: mmap'd TSV parsing,
// CSR/ELL index construction and degree counting, all O(E) with no Python
// interpreter in the loop.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Parse a whitespace/tab-separated file of integers into an int64 buffer.
// Returns number of values parsed, or -1 on error. Caller provides `out`
// sized via graphio_count_ints.
long long graphio_parse_ints(const char* path, long long* out, long long cap) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = (size_t)st.st_size;
  if (len == 0) { close(fd); return 0; }
  const char* buf = (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (buf == MAP_FAILED) return -1;

  long long n = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    // skip non-numeric separators
    while (p < end && (*p < '0' || *p > '9') && *p != '-' && *p != '+') ++p;
    if (p >= end) break;
    bool neg = false;
    if (*p == '-') { neg = true; ++p; }
    else if (*p == '+') { ++p; }
    long long v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      ++p;
      any = true;
    }
    if (!any) continue;
    if (n >= cap) { munmap((void*)buf, len); return -2; }
    out[n++] = neg ? -v : v;
  }
  munmap((void*)buf, len);
  return n;
}

// Count integer tokens and rows (newlines with content) in a file, so the
// caller can size buffers. Returns 0 on success.
int graphio_shape(const char* path, long long* n_values, long long* n_rows) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = (size_t)st.st_size;
  if (len == 0) { *n_values = 0; *n_rows = 0; close(fd); return 0; }
  const char* buf = (const char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (buf == MAP_FAILED) return -1;
  long long vals = 0, rows = 0;
  bool in_num = false, row_has = false;
  for (size_t i = 0; i < len; ++i) {
    char c = buf[i];
    bool digit = (c >= '0' && c <= '9') || c == '-' || c == '+';
    if (digit && !in_num) { ++vals; in_num = true; row_has = true; }
    else if (!digit) {
      in_num = false;
      if (c == '\n' && row_has) { ++rows; row_has = false; }
    }
  }
  if (row_has) ++rows;
  munmap((void*)buf, len);
  *n_values = vals;
  *n_rows = rows;
  return 0;
}

// Stable counting sort of edges by relation. Inputs are file-order arrays of
// length E; outputs: permutation `order [E]` and `rel_ptr [R+1]` offsets.
// Mirrors HeteroGraph's np.argsort(kind='stable') + bincount/cumsum.
int graphio_sort_by_relation(const int32_t* edge_type, long long E,
                             int32_t R, long long* order,
                             long long* rel_ptr) {
  std::vector<long long> counts(R + 1, 0);
  for (long long i = 0; i < E; ++i) {
    int32_t t = edge_type[i];
    if (t < 0 || t >= R) return -1;
    ++counts[t + 1];
  }
  for (int32_t r = 0; r < R; ++r) counts[r + 1] += counts[r];
  for (int32_t r = 0; r <= R; ++r) rel_ptr[r] = counts[r];
  std::vector<long long> cursor(counts.begin(), counts.end());
  for (long long i = 0; i < E; ++i) {
    order[cursor[edge_type[i]]++] = i;
  }
  return 0;
}

// Build an ELL neighbor table for one relation's edge segment (src/dst of
// length E, already restricted to the relation). nbr/mask are [N, Dmax]
// row-major; entries beyond a node's degree stay (0, false). Returns the
// actual max degree (which may exceed Dmax; excess edges are dropped, as in
// HeteroGraph.neighbor_table).
long long graphio_build_ell(const int32_t* src, const int32_t* dst,
                            long long E, long long N, long long Dmax,
                            int32_t* nbr, uint8_t* mask) {
  std::vector<long long> cursor(N, 0);
  long long max_deg = 0;
  for (long long i = 0; i < E; ++i) {
    long long s = src[i];
    if (s < 0 || s >= N) return -1;
    long long c = cursor[s]++;
    if (cursor[s] > max_deg) max_deg = cursor[s];
    if (c < Dmax) {
      nbr[s * Dmax + c] = dst[i];
      mask[s * Dmax + c] = 1;
    }
  }
  return max_deg;
}

// Per-node out-degree for one relation segment.
int graphio_degrees(const int32_t* src, long long E, long long N,
                    int32_t* deg) {
  std::memset(deg, 0, sizeof(int32_t) * (size_t)N);
  for (long long i = 0; i < E; ++i) {
    long long s = src[i];
    if (s < 0 || s >= N) return -1;
    ++deg[s];
  }
  return 0;
}

// Edge permutation sorted by (row / bm, col, original index) — the
// sorted-CSR blocking's build order (ops/pallas_csr.py). Equivalent to
// numpy's stable lexsort((cols, rows // bm)) but ~10x faster at 10M edges
// (the blocking build's dominant cost). Counting-sort by block (stable),
// then per-block std::sort on (col, idx) — O(E + sum_b n_b log n_b).
int graphio_sort_block_col(const long long* rows, const long long* cols,
                           long long E, long long bm, long long* order) {
  if (bm <= 0) return -1;
  long long nb = 0;
  for (long long i = 0; i < E; ++i) {
    long long b = rows[i] / bm;
    if (b < 0) return -1;
    if (b + 1 > nb) nb = b + 1;
  }
  std::vector<long long> off((size_t)nb + 1, 0);
  for (long long i = 0; i < E; ++i) ++off[(size_t)(rows[i] / bm) + 1];
  for (long long b = 0; b < nb; ++b) off[(size_t)b + 1] += off[(size_t)b];
  std::vector<long long> cursor(off.begin(), off.end() - 1);
  for (long long i = 0; i < E; ++i)
    order[cursor[(size_t)(rows[i] / bm)]++] = i;
  for (long long b = 0; b < nb; ++b) {
    long long* lo = order + off[(size_t)b];
    long long* hi = order + off[(size_t)b + 1];
    std::sort(lo, hi, [cols](long long a, long long c) {
      return cols[a] != cols[c] ? cols[a] < cols[c] : a < c;
    });
  }
  return 0;
}

}  // extern "C"
