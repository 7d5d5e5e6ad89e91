// Native host-side symbolic sparse analysis for the TPU framework.
//
// The reference crate implements its whole runtime in native (Rust) code;
// per the build contract the TPU framework's host runtime is native C++.
// These routines are the sequential, pointer-chasing graph algorithms that
// XLA is the wrong tool for: COO->CSR conversion, elimination trees,
// symbolic Cholesky fill, and level-set extraction for parallel triangular
// solves. The numeric phases run on TPU; these produce the static schedules
// they consume.
//
// Exported with C linkage for ctypes. All index arrays are int64 (matching
// numpy's default on the host side); all functions are single-threaded and
// allocation-free (callers pass pre-sized buffers).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COO -> CSR: counting sort by row, then stable per-row ordering by column.
// Duplicates are kept adjacent; the Python wrapper merges them vectorised.
// rows/cols/vals: nnz entries. out_* must be sized: indptr n_rows+1, perm nnz.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int64_t coo_to_csr_perm(int64_t n_rows, int64_t nnz, const int64_t* rows,
                        const int64_t* cols, int64_t* out_indptr,
                        int64_t* out_perm) {
  std::memset(out_indptr, 0, sizeof(int64_t) * (n_rows + 1));
  for (int64_t k = 0; k < nnz; ++k) out_indptr[rows[k] + 1]++;
  for (int64_t r = 0; r < n_rows; ++r) out_indptr[r + 1] += out_indptr[r];
  std::vector<int64_t> next(out_indptr, out_indptr + n_rows);
  for (int64_t k = 0; k < nnz; ++k) out_perm[next[rows[k]]++] = k;
  // Sort each row segment by column id (stable to keep insertion order of
  // duplicates deterministic).
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t lo = out_indptr[r], hi = out_indptr[r + 1];
    std::stable_sort(out_perm + lo, out_perm + hi,
                     [&](int64_t a, int64_t b) { return cols[a] < cols[b]; });
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Elimination tree of a symmetric matrix given its LOWER-triangular CSR
// pattern (diagonal entries ignored). Liu's algorithm with path compression
// via "ancestor". parent[i] = -1 for roots.
// ---------------------------------------------------------------------------
int64_t etree(int64_t n, const int64_t* indptr, const int64_t* indices,
              int64_t* parent) {
  std::vector<int64_t> ancestor(n);
  for (int64_t i = 0; i < n; ++i) {
    parent[i] = -1;
    ancestor[i] = -1;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t k = indices[p];
      // walk from k up to i, compressing
      while (k != -1 && k < i) {
        int64_t next = ancestor[k];
        ancestor[k] = i;
        if (next == -1) parent[k] = i;
        k = next;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Symbolic Cholesky: row counts of L. Pass 1 of the two-pass symbolic
// factorization — for each row i, the nonzero columns of L(i,:) are the
// nodes on the etree paths from each A(i,j) (j<i) up to i. Uses a marker
// array; O(|L|) total.
// out_counts[i] = number of nonzeros in row i of L, INCLUDING the diagonal.
// ---------------------------------------------------------------------------
int64_t chol_row_counts(int64_t n, const int64_t* indptr,
                        const int64_t* indices, const int64_t* parent,
                        int64_t* out_counts) {
  std::vector<int64_t> mark(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    out_counts[i] = 1;  // diagonal
    mark[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      while (j != -1 && j < i && mark[j] != i) {
        mark[j] = i;
        out_counts[i]++;
        j = parent[j];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Symbolic Cholesky pass 2: fill L's column indices row by row (sorted).
// l_indptr must already hold the exclusive prefix sum of row counts.
// ---------------------------------------------------------------------------
int64_t chol_pattern(int64_t n, const int64_t* indptr, const int64_t* indices,
                     const int64_t* parent, const int64_t* l_indptr,
                     int64_t* l_indices) {
  std::vector<int64_t> mark(n, -1);
  std::vector<int64_t> row;
  for (int64_t i = 0; i < n; ++i) {
    row.clear();
    mark[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      while (j != -1 && j < i && mark[j] != i) {
        mark[j] = i;
        row.push_back(j);
        j = parent[j];
      }
    }
    std::sort(row.begin(), row.end());
    int64_t base = l_indptr[i];
    for (size_t k = 0; k < row.size(); ++k) l_indices[base + k] = row[k];
    l_indices[base + static_cast<int64_t>(row.size())] = i;  // diagonal last
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Level sets for a lower-triangular solve: level[i] = 1 + max level of
// off-diagonal dependencies. Returns the number of levels. For an
// upper-triangular solve, pass the transposed pattern.
// ---------------------------------------------------------------------------
int64_t level_sets(int64_t n, const int64_t* indptr, const int64_t* indices,
                   int64_t* level) {
  int64_t max_level = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t lv = 0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j < i && level[j] + 1 > lv) lv = level[j] + 1;
    }
    level[i] = lv;
    if (lv > max_level) max_level = lv;
  }
  return max_level + 1;
}

// ---------------------------------------------------------------------------
// Postorder of the elimination tree (for supernode detection / AMD-style
// reordering downstream). Iterative DFS over first-child/next-sibling.
// ---------------------------------------------------------------------------
int64_t postorder(int64_t n, const int64_t* parent, int64_t* post) {
  std::vector<int64_t> head(n, -1), next(n, -1), stack;
  for (int64_t i = n - 1; i >= 0; --i) {
    int64_t p = parent[i];
    if (p != -1) {
      next[i] = head[p];
      head[p] = i;
    }
  }
  int64_t k = 0;
  for (int64_t root = 0; root < n; ++root) {
    if (parent[root] != -1) continue;
    stack.push_back(root);
    while (!stack.empty()) {
      int64_t node = stack.back();
      int64_t child = head[node];
      if (child != -1) {
        head[node] = next[child];
        stack.push_back(child);
      } else {
        stack.pop_back();
        post[k++] = node;
      }
    }
  }
  return k;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// Left-looking Cholesky update triples (numeric-phase scatter lists).
//
// Input: CSC pattern of L (col_ptr, row_idx; diagonal first per column) and
// the fan-in level of each column. For every column k and every ordered pair
// (j = row_idx[p], i = row_idx[q]) with p <= q over k's below-diagonal rows,
// the update L[i,j] -= L[i,k] * L[j,k] is emitted as the triple
//   (dst = pos(i,j), src_a = q, src_b = p)
// grouped by level[j]. Destination positions are found by merging k's row
// tail against column j's sorted row list (no hash lookups). Pairs whose
// (i,j) position is absent from the pattern (incomplete factorizations)
// are skipped.
//
// Two-phase API: pass count_only=1 to fill lvl_counts (size nlev) with the
// number of triples per level; then allocate per-level offsets and call with
// count_only=0 and lvl_offsets holding the running write cursor per level
// (exclusive prefix of counts; modified in place).
// Returns total number of triples emitted/counted.
// ---------------------------------------------------------------------------
int64_t chol_update_triples(int64_t n, const int64_t* col_ptr,
                            const int64_t* row_idx, const int64_t* level,
                            int64_t count_only, int64_t* lvl_counts_or_offsets,
                            int64_t* out_dst, int64_t* out_a,
                            int64_t* out_b) {
  int64_t total = 0;
  for (int64_t k = 0; k < n; ++k) {
    int64_t lo = col_ptr[k] + 1;  // skip diagonal
    int64_t hi = col_ptr[k + 1];
    for (int64_t p = lo; p < hi; ++p) {
      int64_t j = row_idx[p];
      int64_t lvl = level[j];
      // Merge k's tail rows [p, hi) against column j's rows to locate
      // dst positions; both are sorted ascending.
      int64_t jp = col_ptr[j];
      int64_t jhi = col_ptr[j + 1];
      for (int64_t q = p; q < hi; ++q) {
        int64_t i = row_idx[q];
        while (jp < jhi && row_idx[jp] < i) ++jp;
        if (jp >= jhi) break;
        if (row_idx[jp] != i) continue;  // incomplete: outside pattern
        if (count_only) {
          lvl_counts_or_offsets[lvl]++;
        } else {
          int64_t w = lvl_counts_or_offsets[lvl]++;
          out_dst[w] = jp;
          out_a[w] = q;
          out_b[w] = p;
        }
        ++total;
      }
    }
  }
  return total;
}

}  // extern "C"
