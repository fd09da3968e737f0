// Symbolic sparse-factorization analysis (native host-side runtime).
//
// TPU-native analogue of the host portions of the reference's SSIDS
// analyse phase (reference src/ssids/anal.f90: ordering, assembly-tree
// construction, supernode amalgamation; orderings via mc61/mc68 in
// src/sls/sls.f90).  The numeric phase runs on-device (JAX/Pallas,
// linalg/supernodal.py); everything here is pure graph work that XLA
// cannot express and the reference also keeps on the host in
// Fortran/C++ — hence C++ with a C ABI, loaded via ctypes.
//
// Contents:
//   rcm_order       — reverse Cuthill-McKee (bandwidth-reducing, the
//                     MC61 role; feeds the block-tridiagonal path)
//   amd_order       — minimum-degree ordering (quotient-free simple
//                     variant, the mc68/AMD role for fill reduction)
//   etree           — elimination tree of A (Liu's algorithm)
//   postorder_tree  — depth-first postorder of the etree
//   supernodes      — fundamental supernode partition from column
//                     counts + parent chain amalgamation
//   tree_levels     — bottom-up level schedule of the supernode tree
//                     (nodes within a level factor as one batch)
//
// Graph input: symmetric pattern in CSR (rowptr/colind, 0-based, both
// triangles, no diagonal required).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// --- reverse Cuthill-McKee ------------------------------------------------
// perm[k] = original index of the k-th variable in the new order.
void rcm_order(int32_t n, const int32_t* rowptr, const int32_t* colind,
               int32_t* perm) {
  std::vector<int32_t> deg(n);
  for (int32_t i = 0; i < n; ++i) deg[i] = rowptr[i + 1] - rowptr[i];
  std::vector<char> seen(n, 0);
  int32_t out = 0;
  // process each connected component: start from a minimum-degree vertex
  for (;;) {
    int32_t start = -1, best = INT32_MAX;
    for (int32_t i = 0; i < n; ++i)
      if (!seen[i] && deg[i] < best) { best = deg[i]; start = i; }
    if (start < 0) break;
    std::queue<int32_t> q;
    q.push(start);
    seen[start] = 1;
    std::vector<int32_t> nbr;
    while (!q.empty()) {
      int32_t u = q.front();
      q.pop();
      perm[out++] = u;
      nbr.clear();
      for (int32_t p = rowptr[u]; p < rowptr[u + 1]; ++p) {
        int32_t v = colind[p];
        if (v >= 0 && v < n && !seen[v]) { seen[v] = 1; nbr.push_back(v); }
      }
      std::sort(nbr.begin(), nbr.end(),
                [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });
      for (int32_t v : nbr) q.push(v);
    }
  }
  std::reverse(perm, perm + n);
}

// --- minimum degree (simple, exact-degree, no supervariables) -------------
// O(n^2 + n*nnz) worst case; fine for the host-side analyse of problems
// whose numeric phase dominates.  For very large patterns, RCM + the
// banded path is the intended route.
void amd_order(int32_t n, const int32_t* rowptr, const int32_t* colind,
               int32_t* perm) {
  std::vector<std::vector<int32_t>> adj(n);
  for (int32_t i = 0; i < n; ++i)
    for (int32_t p = rowptr[i]; p < rowptr[i + 1]; ++p) {
      int32_t j = colind[p];
      if (j != i && j >= 0 && j < n) adj[i].push_back(j);
    }
  for (auto& a : adj) {
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
  }
  std::vector<char> gone(n, 0);
  for (int32_t k = 0; k < n; ++k) {
    // pick min-degree remaining vertex
    int32_t best = -1, bdeg = INT32_MAX;
    for (int32_t i = 0; i < n; ++i)
      if (!gone[i] && (int32_t)adj[i].size() < bdeg) {
        bdeg = (int32_t)adj[i].size();
        best = i;
      }
    perm[k] = best;
    gone[best] = 1;
    // eliminate: connect its remaining neighbours into a clique
    std::vector<int32_t> nb;
    for (int32_t v : adj[best])
      if (!gone[v]) nb.push_back(v);
    for (int32_t v : nb) {
      auto& av = adj[v];
      // remove 'best', add clique members
      std::vector<int32_t> merged;
      merged.reserve(av.size() + nb.size());
      for (int32_t w : av)
        if (w != best && !gone[w]) merged.push_back(w);
      for (int32_t w : nb)
        if (w != v) merged.push_back(w);
      std::sort(merged.begin(), merged.end());
      merged.erase(std::unique(merged.begin(), merged.end()), merged.end());
      av.swap(merged);
    }
  }
}

// --- elimination tree (Liu) ----------------------------------------------
// Pattern must be PERMUTED already; parent[v] = etree parent or -1.
void etree(int32_t n, const int32_t* rowptr, const int32_t* colind,
           int32_t* parent) {
  std::vector<int32_t> ancestor(n, -1);
  for (int32_t i = 0; i < n; ++i) parent[i] = -1;
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t p = rowptr[i]; p < rowptr[i + 1]; ++p) {
      int32_t k = colind[p];
      if (k >= i) continue;  // lower part: walk from k up to i
      int32_t r = k;
      while (r != -1 && r != i) {
        int32_t next = ancestor[r];
        ancestor[r] = i;
        if (next == -1) parent[r] = i;
        r = next;
      }
    }
  }
}

// --- postorder of a forest ------------------------------------------------
void postorder_tree(int32_t n, const int32_t* parent, int32_t* post) {
  std::vector<std::vector<int32_t>> kids(n);
  std::vector<int32_t> roots;
  for (int32_t v = 0; v < n; ++v) {
    if (parent[v] < 0)
      roots.push_back(v);
    else
      kids[parent[v]].push_back(v);
  }
  int32_t out = 0;
  std::vector<std::pair<int32_t, size_t>> stack;
  for (int32_t r : roots) {
    stack.push_back({r, 0});
    while (!stack.empty()) {
      auto& [v, ci] = stack.back();
      if (ci < kids[v].size()) {
        int32_t c = kids[v][ci++];
        stack.push_back({c, 0});
      } else {
        post[out++] = v;
        stack.pop_back();
      }
    }
  }
}

// --- fundamental supernodes + relaxed amalgamation ------------------------
// Inputs: parent (etree, postordered labels), colcount[v] = nnz(L[:,v])
// (including diagonal).  Output: snode[v] = supernode id of column v
// (ids contiguous, ordered), returns #supernodes.  Columns v-1, v merge
// when parent[v-1] == v and the struct defect
//   diff = colcount[v] + 1 - colcount[v-1]   (>= 0 by column
// replication when the parent relation holds; 0 == fundamental)
// is at most relax_cols (relaxed amalgamation: diff artificial zero
// rows per merged column, SSIDS-style).
int32_t supernodes(int32_t n, const int32_t* parent, const int32_t* colcount,
                   int32_t relax_cols, int32_t* snode) {
  int32_t ns = 0;
  if (n == 0) return 0;
  snode[0] = 0;
  for (int32_t v = 1; v < n; ++v) {
    int32_t diff = colcount[v] + 1 - colcount[v - 1];
    bool fuse = (parent[v - 1] == v) && diff >= 0 && diff <= relax_cols;
    if (!fuse) ++ns;
    snode[v] = ns;
  }
  return ns + 1;
}

// --- level schedule of the supernode tree ---------------------------------
// sparent[s] = supernode parent (or -1).  level[s] = max level of
// children + 1 (leaves = 0).  Returns max level + 1.
int32_t tree_levels(int32_t nsuper, const int32_t* sparent, int32_t* level) {
  // children-first order: supernode ids are already topological
  // (columns ascend), so one forward pass suffices.
  int32_t maxl = 0;
  for (int32_t s = 0; s < nsuper; ++s) level[s] = 0;
  for (int32_t s = 0; s < nsuper; ++s) {
    int32_t p = sparent[s];
    if (p >= 0 && level[s] + 1 > level[p]) level[p] = level[s] + 1;
    if (level[s] > maxl) maxl = level[s];
  }
  return maxl + 1;
}

}  // extern "C"
