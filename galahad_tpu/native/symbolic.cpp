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

// --- approximate minimum degree (quotient graph, bucket degree lists) -----
// AMD-style: eliminated variables become *elements* whose cliques are
// stored implicitly (one member list per element, absorbed on use), so
// fill is never materialised as edges.  Degrees are the standard upper
// bound |A_i| + sum_e |L_e \ {i}|; candidates are drawn from
// doubly-linked degree buckets, giving near-linear behaviour on the
// KKT/grid patterns this library factors (replaces the reference's
// mc68/AMD role, src/sls/sls.f90 ordering controls).
void amd_order(int32_t n, const int32_t* rowptr, const int32_t* colind,
               int32_t* perm) {
  if (n == 0) return;
  // variable adjacency (original entries only; shrinks as entries die)
  std::vector<std::vector<int32_t>> A(n);
  for (int32_t i = 0; i < n; ++i)
    for (int32_t p = rowptr[i]; p < rowptr[i + 1]; ++p) {
      int32_t j = colind[p];
      if (j != i && j >= 0 && j < n) A[i].push_back(j);
    }
  for (auto& a : A) {
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
  }
  // elements: member lists; elem id == the eliminated variable's id
  std::vector<std::vector<int32_t>> elem_members(n);
  std::vector<std::vector<int32_t>> E(n);  // element lists per variable
  std::vector<char> dead_elem(n, 0);       // absorbed elements
  std::vector<char> gone(n, 0);            // eliminated variables
  // degree buckets (doubly linked)
  std::vector<int32_t> head(n + 1, -1), nxt(n, -1), prv(n, -1), deg(n, 0);
  auto bucket_remove = [&](int32_t i) {
    if (prv[i] >= 0) nxt[prv[i]] = nxt[i];
    else head[deg[i]] = nxt[i];
    if (nxt[i] >= 0) prv[nxt[i]] = prv[i];
    nxt[i] = prv[i] = -1;
  };
  auto bucket_insert = [&](int32_t i, int32_t d) {
    if (d > n) d = n;
    if (d < 0) d = 0;
    deg[i] = d;
    nxt[i] = head[d];
    prv[i] = -1;
    if (head[d] >= 0) prv[head[d]] = i;
    head[d] = i;
  };
  for (int32_t i = 0; i < n; ++i) bucket_insert(i, (int32_t)A[i].size());

  std::vector<int32_t> mark(n, -1);
  std::vector<int32_t> Lp;  // scratch: pattern of the current pivot
  int32_t mindeg = 0;
  for (int32_t k = 0; k < n;) {
    // next pivot: lowest non-empty bucket
    while (mindeg <= n && head[mindeg] < 0) ++mindeg;
    int32_t p = head[mindeg];
    bucket_remove(p);
    gone[p] = 1;
    perm[k++] = p;
    // L_p = (A_p  U  union of member lists of p's elements) \ eliminated
    Lp.clear();
    const int32_t stamp = p;
    mark[p] = stamp;
    for (int32_t v : A[p])
      if (!gone[v] && mark[v] != stamp) {
        mark[v] = stamp;
        Lp.push_back(v);
      }
    for (int32_t e : E[p]) {
      if (dead_elem[e]) continue;
      for (int32_t v : elem_members[e])
        if (!gone[v] && mark[v] != stamp) {
          mark[v] = stamp;
          Lp.push_back(v);
        }
      dead_elem[e] = 1;                     // absorbed into element p
      elem_members[e].clear();
      elem_members[e].shrink_to_fit();
    }
    E[p].clear();
    E[p].shrink_to_fit();
    A[p].clear();
    A[p].shrink_to_fit();
    if (Lp.empty()) continue;
    elem_members[p] = Lp;                   // new element
    // update every variable adjacent to the new element
    for (int32_t i : Lp) {
      // purge A_i of eliminated vars and of vars already covered by the
      // new element (they are reachable through it; keeping them only
      // inflates the degree bound)
      auto& ai = A[i];
      size_t w = 0;
      for (size_t r = 0; r < ai.size(); ++r) {
        int32_t v = ai[r];
        if (gone[v] || (mark[v] == stamp && v != i)) continue;
        ai[w++] = v;
      }
      ai.resize(w);
      // purge dead elements; append the new one
      auto& ei = E[i];
      w = 0;
      for (size_t r = 0; r < ei.size(); ++r)
        if (!dead_elem[ei[r]]) ei[w++] = ei[r];
      ei.resize(w);
      ei.push_back(p);
      // approximate external degree
      int64_t d = (int64_t)ai.size();
      for (int32_t e : ei) d += (int64_t)elem_members[e].size() - 1;
      bucket_remove(i);
      bucket_insert(i, (int32_t)(d > n ? n : d));
      if (deg[i] < mindeg) mindeg = deg[i];
    }
  }
}

// --- nested dissection ------------------------------------------------
// ND + minimum-degree-on-leaves hybrid (the METIS_NodeND role the
// reference reaches through mc68/METIS in src/sls/sls.f90 and SSIDS
// analyse).  Level-set vertex separators from a pseudo-peripheral BFS;
// subgraphs below the leaf threshold are ordered by the AMD above.
// perm[k] = original index of the k-th variable in the new order.

static void nd_amd_leaf(const int32_t* rowptr, const int32_t* colind,
                        const std::vector<int32_t>& verts,
                        std::vector<int32_t>& local,  // size n scratch, -1
                        int32_t* out) {
  const int32_t ns = (int32_t)verts.size();
  for (int32_t k = 0; k < ns; ++k) local[verts[k]] = k;
  // subgraph CSR
  std::vector<int32_t> sp(ns + 1, 0), sc;
  for (int32_t k = 0; k < ns; ++k) {
    int32_t u = verts[k];
    for (int32_t p = rowptr[u]; p < rowptr[u + 1]; ++p)
      if (local[colind[p]] >= 0) ++sp[k + 1];
  }
  for (int32_t k = 0; k < ns; ++k) sp[k + 1] += sp[k];
  sc.resize(sp[ns]);
  {
    std::vector<int32_t> w(sp.begin(), sp.end() - 1);
    for (int32_t k = 0; k < ns; ++k) {
      int32_t u = verts[k];
      for (int32_t p = rowptr[u]; p < rowptr[u + 1]; ++p) {
        int32_t lv = local[colind[p]];
        if (lv >= 0) sc[w[k]++] = lv;
      }
    }
  }
  std::vector<int32_t> lperm(ns);
  amd_order(ns, sp.data(), sc.data(), lperm.data());
  for (int32_t k = 0; k < ns; ++k) out[k] = verts[lperm[k]];
  for (int32_t v : verts) local[v] = -1;
}

void nd_order(int32_t n, const int32_t* rowptr, const int32_t* colind,
              int32_t leaf_size, int32_t* perm) {
  if (n == 0) return;
  if (leaf_size < 8) leaf_size = 8;
  std::vector<int32_t> local(n, -1);     // shared scratch for leaves
  std::vector<int32_t> lvl(n, -1);       // BFS level per vertex
  std::vector<int32_t> stamp(n, -1);     // job membership marker
  int32_t jobid = 0;
  std::vector<int32_t> bfs;              // BFS order scratch
  bfs.reserve(n);

  // explicit work stack: (vertex subset, output offset)
  struct Job {
    std::vector<int32_t> verts;
    int32_t lo;
  };
  std::vector<Job> stack;
  {
    std::vector<int32_t> all(n);
    for (int32_t i = 0; i < n; ++i) all[i] = i;
    stack.push_back({std::move(all), 0});
  }
  while (!stack.empty()) {
    Job job = std::move(stack.back());
    stack.pop_back();
    std::vector<int32_t>& S = job.verts;
    const int32_t ns = (int32_t)S.size();
    if (ns <= leaf_size) {
      nd_amd_leaf(rowptr, colind, S, local, perm + job.lo);
      continue;
    }
    // BFS from S[0]; then from the farthest vertex (pseudo-peripheral)
    ++jobid;
    for (int32_t v : S) {
      stamp[v] = jobid;
      lvl[v] = -1;
    }
    int32_t src = S[0];
    for (int pass = 0; pass < 2; ++pass) {
      bfs.clear();
      bfs.push_back(src);
      lvl[src] = 0;
      for (size_t q = 0; q < bfs.size(); ++q) {
        int32_t u = bfs[q];
        for (int32_t p = rowptr[u]; p < rowptr[u + 1]; ++p) {
          int32_t v = colind[p];
          if (v >= 0 && v < n && stamp[v] == jobid && lvl[v] < 0) {
            lvl[v] = lvl[u] + 1;
            bfs.push_back(v);
          }
        }
      }
      if (pass == 0 && (int32_t)bfs.size() == ns) {
        src = bfs.back();                 // farthest: restart from it
        for (int32_t v : S) lvl[v] = -1;
      } else {
        break;
      }
    }
    if ((int32_t)bfs.size() < ns) {
      // disconnected: component goes one way, the rest the other
      std::vector<int32_t> A(bfs), B;
      B.reserve(ns - bfs.size());
      for (int32_t v : S)
        if (lvl[v] < 0) B.push_back(v);
      stack.push_back({std::move(B), job.lo + (int32_t)A.size()});
      stack.push_back({std::move(A), job.lo});
      continue;
    }
    const int32_t nlev = lvl[bfs.back()] + 1;
    if (nlev < 3) {                       // no useful level separator
      nd_amd_leaf(rowptr, colind, S, local, perm + job.lo);
      continue;
    }
    // split level: cumulative half
    std::vector<int32_t> cnt(nlev, 0);
    for (int32_t v : S) ++cnt[lvl[v]];
    int32_t mid = 0, acc = 0;
    while (mid < nlev - 2 && acc + cnt[mid] < ns / 2) acc += cnt[mid++];
    if (mid == 0) mid = 1;
    if (mid >= nlev - 1) mid = nlev - 2;
    // separator: level-mid vertices adjacent to level mid+1
    std::vector<int32_t> A, B, sep;
    for (int32_t v : S) {
      if (lvl[v] < mid) {
        A.push_back(v);
      } else if (lvl[v] > mid) {
        B.push_back(v);
      } else {
        bool bnd = false;
        for (int32_t p = rowptr[v]; p < rowptr[v + 1] && !bnd; ++p) {
          int32_t u = colind[p];
          bnd = (u >= 0 && u < n && stamp[u] == jobid &&
                 lvl[u] == mid + 1);
        }
        (bnd ? sep : A).push_back(v);
      }
    }
    if (A.empty() || B.empty()) {         // degenerate split
      nd_amd_leaf(rowptr, colind, S, local, perm + job.lo);
      continue;
    }
    // separator last (eliminated after both halves)
    int32_t off = job.lo + (int32_t)A.size() + (int32_t)B.size();
    for (size_t k = 0; k < sep.size(); ++k) perm[off + (int32_t)k] = sep[k];
    stack.push_back({std::move(B), job.lo + (int32_t)A.size()});
    stack.push_back({std::move(A), job.lo});
  }
}

// --- symbolic factorization: etree + column counts + L pattern -------------
// Row-walk algorithm: row i of L reaches exactly the columns on the
// etree paths from each entry k (k < i) of row i up toward i.  One pass
// computes parents + per-column counts; a second pass (same walk)
// emits the strict-lower pattern.  This is the host analyse step the
// reference performs inside SSIDS (src/ssids/anal.f90) and MA27/SILS.
// Input: lower-triangle pattern (row > col, diagonal optional) in CSC.
int64_t symbolic_count(int32_t n, const int64_t* colptr, const int32_t* rowind,
                       int32_t* parent, int32_t* colcount) {
  // row-wise lists of the strict lower triangle
  std::vector<int64_t> rptr(n + 1, 0);
  for (int32_t j = 0; j < n; ++j)
    for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p)
      if (rowind[p] > j) ++rptr[rowind[p] + 1];
  for (int32_t i = 0; i < n; ++i) rptr[i + 1] += rptr[i];
  std::vector<int32_t> rind(rptr[n]);
  {
    std::vector<int64_t> w(rptr.begin(), rptr.end() - 1);
    for (int32_t j = 0; j < n; ++j)
      for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p)
        if (rowind[p] > j) rind[w[rowind[p]]++] = j;
  }
  std::vector<int32_t> mark(n, -1);
  for (int32_t i = 0; i < n; ++i) {
    parent[i] = -1;
    colcount[i] = 1;  // diagonal
  }
  int64_t nnz = 0;
  for (int32_t i = 0; i < n; ++i) {
    mark[i] = i;
    for (int64_t p = rptr[i]; p < rptr[i + 1]; ++p) {
      int32_t j = rind[p];
      while (mark[j] != i) {
        mark[j] = i;
        ++colcount[j];
        ++nnz;
        if (parent[j] < 0) parent[j] = i;
        j = parent[j];
      }
    }
  }
  return nnz;  // strict-lower entries of L
}

// Second pass: emit the strict-lower pattern (rows ascend within each
// column).  parent must come from symbolic_count; Lp has n+1 slots.
void symbolic_pattern(int32_t n, const int64_t* colptr, const int32_t* rowind,
                      const int32_t* parent, const int32_t* colcount,
                      int64_t* Lp, int32_t* Li) {
  Lp[0] = 0;
  for (int32_t j = 0; j < n; ++j) Lp[j + 1] = Lp[j] + (colcount[j] - 1);
  std::vector<int64_t> w(n);
  for (int32_t j = 0; j < n; ++j) w[j] = Lp[j];
  // row-wise lists again
  std::vector<int64_t> rptr(n + 1, 0);
  for (int32_t j = 0; j < n; ++j)
    for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p)
      if (rowind[p] > j) ++rptr[rowind[p] + 1];
  for (int32_t i = 0; i < n; ++i) rptr[i + 1] += rptr[i];
  std::vector<int32_t> rind(rptr[n]);
  {
    std::vector<int64_t> ww(rptr.begin(), rptr.end() - 1);
    for (int32_t j = 0; j < n; ++j)
      for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p)
        if (rowind[p] > j) rind[ww[rowind[p]]++] = j;
  }
  std::vector<int32_t> mark(n, -1);
  for (int32_t i = 0; i < n; ++i) {
    mark[i] = i;
    for (int64_t p = rptr[i]; p < rptr[i + 1]; ++p) {
      int32_t j = rind[p];
      while (mark[j] != i) {
        mark[j] = i;
        Li[w[j]++] = i;  // rows emitted in ascending i
        j = parent[j];
      }
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
