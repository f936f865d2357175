// Sparse LDL^T factorization for symmetric (quasi-definite) matrices.
//
// TPU-native replacement for the factorization the MATLAB reference obtains
// from the built-in `ldl` (MA57-class) call in /root/reference/ops/opLDL2.m:82.
// The constraint preconditioner K_P = [G B'; B -C] is symmetric quasi-definite
// whenever G is SPD and C is SPD (Vanderbei), so an up-looking simplicial
// factorization with 1x1 pivots and static sign-based regularization is exact
// for the supported problem class; iterative refinement in the preconditioner
// operator (see precond/cp.py) absorbs any regularization error.
//
// Input:  upper triangular part (incl. diagonal) of the permuted matrix in
//         compressed-sparse-column form (Ap, Ai, Ax), column-sorted.
// Output: strictly-lower factor L in CSC form (Lp, Li, Lx) and diagonal D.
//
// Two passes: a symbolic pass builds the elimination tree and per-column
// counts of L; the numeric pass performs the up-looking row-by-row
// factorization.  O(nnz(L)) time beyond sorting.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Symbolic analysis: computes elimination tree `parent` and the number of
// strictly-lower nonzeros of each column of L in `colcount`.
// Returns total nnz(L).
int64_t cpk_ldl_symbolic(int32_t n, const int32_t *Ap, const int32_t *Ai,
                         int32_t *parent, int32_t *colcount) {
  std::vector<int32_t> flag(n);
  for (int32_t k = 0; k < n; ++k) {
    parent[k] = -1;
    flag[k] = k;
    colcount[k] = 0;
    for (int32_t p = Ap[k]; p < Ap[k + 1]; ++p) {
      int32_t i = Ai[p];
      if (i >= k) continue;  // strictly-upper entries drive the pattern
      // Walk from i towards the root of the etree; every vertex newly marked
      // on the path contributes one entry to row k of L (so one to column i').
      while (flag[i] != k) {
        if (parent[i] == -1) parent[i] = k;
        ++colcount[i];
        flag[i] = k;
        i = parent[i];
      }
    }
  }
  int64_t total = 0;
  for (int32_t k = 0; k < n; ++k) total += colcount[k];
  return total;
}

// Numeric factorization.  `Lp` must hold the column pointers (exclusive
// prefix sum of colcount, length n+1); `parent` is the etree from the
// symbolic pass.  `pivot_signs` may be null; when present, pivot k with
// |d| < reg_tol or the wrong sign is replaced by pivot_signs[k] * reg_value.
// Returns the number of perturbed pivots, or -(k+1) on a fatal zero pivot.
int64_t cpk_ldl_numeric(int32_t n, const int32_t *Ap, const int32_t *Ai,
                        const double *Ax, const int32_t *Lp,
                        const int32_t *parent, int32_t *Li, double *Lx,
                        double *D, const double *pivot_signs, double reg_tol,
                        double reg_value) {
  std::vector<int32_t> flag(n), pattern(n), head(n);
  std::vector<double> y(n, 0.0);
  // `head[j]` is the write position for the next entry appended to column j.
  for (int32_t j = 0; j < n; ++j) head[j] = Lp[j];
  int64_t nperturbed = 0;

  for (int32_t k = 0; k < n; ++k) {
    int32_t top = n;
    flag[k] = k;
    double dk = 0.0;
    for (int32_t p = Ap[k]; p < Ap[k + 1]; ++p) {
      int32_t i = Ai[p];
      if (i > k) continue;
      if (i == k) {
        dk += Ax[p];
        continue;
      }
      y[i] += Ax[p];
      // Collect the path from i to the already-marked part of the tree, then
      // push it reversed so the final traversal is in topological order.
      int32_t len = 0;
      while (flag[i] != k) {
        pattern[len++] = i;
        flag[i] = k;
        i = parent[i];
      }
      while (len > 0) pattern[--top] = pattern[--len];
    }
    // Up-looking elimination along the pattern (ascending etree order).
    for (int32_t s = top; s < n; ++s) {
      int32_t j = pattern[s];
      double yj = y[j];
      y[j] = 0.0;
      double ljk = yj / D[j];
      for (int32_t q = Lp[j]; q < head[j]; ++q) y[Li[q]] -= Lx[q] * yj;
      dk -= ljk * yj;
      Li[head[j]] = k;
      Lx[head[j]] = ljk;
      ++head[j];
    }
    if (pivot_signs != nullptr) {
      double sign = pivot_signs[k];
      if (std::fabs(dk) < reg_tol || (sign != 0.0 && dk * sign < 0.0)) {
        dk = (sign >= 0.0 ? 1.0 : -1.0) * reg_value;
        ++nperturbed;
      }
    } else if (dk == 0.0) {
      return -(int64_t)(k + 1);
    }
    D[k] = dk;
  }
  return nperturbed;
}

}  // extern "C"
