// Andersen push-based personalized PageRank over all source nodes.
//
// TPU-native framework's offline preprocessing kernel. Replaces the
// reference's numba-JIT CPU kernel (reference:
// src/util/calc_ppr_scores.py:137-192) with a multithreaded C++
// implementation exposed through a C ABI (loaded via ctypes).
//
// Semantics match the reference exactly:
//   * residual push with stack order (LIFO),
//   * push when r[v] >= alpha * eps * out_degree[v],
//   * per-source output = the support + values of the approximate PPR
//     vector (p includes the source itself).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libppr_push.so ppr_push.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>
#include <unordered_map>

namespace {

struct NodeResult {
  std::vector<int32_t> ids;
  std::vector<float> vals;
};

void ppr_push_range(const int64_t* indptr, const int32_t* indices,
                    const int64_t* out_degree, double alpha, double eps,
                    int64_t n, std::atomic<int64_t>* next,
                    std::vector<NodeResult>* results) {
  const double alpha_eps = alpha * eps;
  // Reusable sparse accumulators: dense arrays + touched lists. Much faster
  // than hash maps for repeated single-source pushes.
  std::vector<double> p(n, 0.0), r(n, 0.0);
  std::vector<uint8_t> in_q(n, 0);
  std::vector<int32_t> touched;
  std::vector<int32_t> q;
  touched.reserve(1024);
  q.reserve(1024);

  for (;;) {
    int64_t inode = next->fetch_add(1);
    if (inode >= n) break;

    touched.clear();
    q.clear();
    r[inode] = alpha;
    p[inode] = 0.0;
    touched.push_back((int32_t)inode);
    q.push_back((int32_t)inode);
    in_q[inode] = 1;

    while (!q.empty()) {
      int32_t u = q.back();
      q.pop_back();
      in_q[u] = 0;
      double res = r[u];
      p[u] += res;
      r[u] = 0.0;
      int64_t du = out_degree[u];
      if (du == 0) continue;
      double val = (1.0 - alpha) * res / (double)du;
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int32_t v = indices[e];
        if (r[v] == 0.0 && p[v] == 0.0) touched.push_back(v);
        r[v] += val;
        if (r[v] >= alpha_eps * (double)out_degree[v] && !in_q[v]) {
          q.push_back(v);
          in_q[v] = 1;
        }
      }
    }

    NodeResult& out = (*results)[inode];
    out.ids.reserve(touched.size());
    out.vals.reserve(touched.size());
    for (int32_t v : touched) {
      if (p[v] != 0.0) {
        out.ids.push_back(v);
        out.vals.push_back((float)p[v]);
      }
      p[v] = 0.0;
      r[v] = 0.0;
      in_q[v] = 0;
    }
    // source always included even if p == 0 (mirrors p = {inode: 0.0} init)
    if (out.ids.empty()) {
      out.ids.push_back((int32_t)inode);
      out.vals.push_back(0.0f);
    }
  }
}

std::vector<NodeResult> g_results;  // staging between the two ABI calls

}  // namespace

extern "C" {

// Phase 1: run pushes, return total nnz. Results staged in g_results.
int64_t ppr_push_run(const int64_t* indptr, const int32_t* indices,
                     const int64_t* out_degree, double alpha, double eps,
                     int64_t num_nodes, int32_t num_threads) {
  g_results.assign(num_nodes, NodeResult{});
  std::atomic<int64_t> next(0);
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back(ppr_push_range, indptr, indices, out_degree, alpha,
                         eps, num_nodes, &next, &g_results);
  }
  for (auto& th : threads) th.join();
  int64_t nnz = 0;
  for (auto& nr : g_results) nnz += (int64_t)nr.ids.size();
  return nnz;
}

// Phase 2: copy staged results into caller buffers (CSR layout) and free.
void ppr_push_collect(int64_t* out_indptr, int32_t* out_indices,
                      float* out_vals) {
  int64_t off = 0;
  int64_t n = (int64_t)g_results.size();
  out_indptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const NodeResult& nr = g_results[i];
    std::memcpy(out_indices + off, nr.ids.data(),
                nr.ids.size() * sizeof(int32_t));
    std::memcpy(out_vals + off, nr.vals.data(),
                nr.vals.size() * sizeof(float));
    off += (int64_t)nr.ids.size();
    out_indptr[i + 1] = off;
  }
  g_results.clear();
  g_results.shrink_to_fit();
}

}  // extern "C"
