// sfnav: native data-plane kernels for speaker_follower_tpu.
//
// The reference's native layer is the C++ Matterport simulator
// (src/lib/MatterSim.cpp); in the TPU-native design the simulator is a set
// of precompiled device tables, so the native code moves to where it still
// pays: the host data plane.
//
//   * sfnav_read_feature_tsv: stream-parse the 2.9GB mean-pooled feature
//     TSV (scanId \t viewpointId \t w \t h \t vfov \t base64(float32 x
//     36*2048)) — the python csv+base64 path takes minutes on the 1-core
//     host, this takes seconds.
//   * sfnav_all_pairs_shortest: per-scan all-pairs Dijkstra with next-hop
//     extraction (binary heap), replacing scipy for graph precompilation.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- base64

static const int8_t B64_LUT[256] = {
    // clang-format off
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,62,-1,-1,-1,63,
    52,53,54,55,56,57,58,59,60,61,-1,-1,-1,-2,-1,-1,
    -1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9,10,11,12,13,14,
    15,16,17,18,19,20,21,22,23,24,25,-1,-1,-1,-1,-1,
    -1,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40,
    41,42,43,44,45,46,47,48,49,50,51,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    -1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,
    // clang-format on
};

// Decode base64 (ignoring whitespace) into out; returns bytes written or -1.
int64_t sfnav_base64_decode(const char* src, int64_t src_len, uint8_t* out,
                            int64_t out_cap) {
  int64_t written = 0;
  uint32_t acc = 0;
  int bits = 0;
  for (int64_t i = 0; i < src_len; ++i) {
    const unsigned char ch = (unsigned char)src[i];
    const int8_t v = B64_LUT[ch];
    if (v == -2) break;  // '=' padding: stop
    if (v < 0) continue; // skip whitespace/newlines
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (written >= out_cap) return -1;
      out[written++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return written;
}

// ----------------------------------------------------------- feature TSV

// Parse the feature TSV: fills ids (rows x id_cap bytes, "scan_viewpoint"
// zero-padded) and feats (rows x feat_len float32).  Returns rows parsed,
// or -errno-like negative on failure.
int64_t sfnav_read_feature_tsv(const char* path, int64_t max_rows,
                               int64_t feat_len, char* ids, int64_t id_cap,
                               float* feats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // lines are ~3.6MB (base64 of 288KB); buffer generously
  std::vector<char> line(8 * 1024 * 1024);
  int64_t row = 0;
  const int64_t feat_bytes = feat_len * (int64_t)sizeof(float);
  while (row < max_rows && fgets(line.data(), (int)line.size(), f)) {
    char* p = line.data();
    // field 0: scanId, field 1: viewpointId, 2-4: w/h/vfov, 5: features
    char* fields[6] = {nullptr};
    fields[0] = p;
    int nf = 1;
    for (char* q = p; *q && nf < 6; ++q) {
      if (*q == '\t') {
        *q = '\0';
        fields[nf++] = q + 1;
      }
    }
    if (nf != 6) { fclose(f); return -2; }
    // id = scanId + '_' + viewpointId
    char* dst = ids + row * id_cap;
    int n = snprintf(dst, (size_t)id_cap, "%s_%s", fields[0], fields[1]);
    if (n < 0 || n >= id_cap) { fclose(f); return -3; }
    const char* b64 = fields[5];
    const int64_t b64_len = (int64_t)strlen(b64);
    int64_t got = sfnav_base64_decode(
        b64, b64_len, (uint8_t*)(feats + row * feat_len), feat_bytes);
    if (got != feat_bytes) { fclose(f); return -4; }
    ++row;
  }
  fclose(f);
  return row;
}

// ------------------------------------------------- all-pairs shortest path

// Dijkstra from every source over an adjacency list built from a dense
// edge/weight matrix.  dist: (n*n) float32 (inf when unreachable);
// next_hop: (n*n) int32 (-1 when none) — first hop from i toward j.
void sfnav_all_pairs_shortest(int32_t n, const uint8_t* edges,
                              const float* weights, float* dist,
                              int32_t* next_hop) {
  // adjacency list
  std::vector<int32_t> adj_start(n + 1, 0);
  std::vector<int32_t> adj_to;
  std::vector<float> adj_w;
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t j = 0; j < n; ++j) {
      if (edges[(int64_t)i * n + j]) {
        adj_to.push_back(j);
        adj_w.push_back(weights[(int64_t)i * n + j]);
      }
    }
    adj_start[i + 1] = (int32_t)adj_to.size();
  }

  const float INF = INFINITY;
  std::vector<float> d(n);
  std::vector<int32_t> first(n);  // first hop from source
  using QE = std::pair<float, int32_t>;
  for (int32_t s = 0; s < n; ++s) {
    std::fill(d.begin(), d.end(), INF);
    std::fill(first.begin(), first.end(), -1);
    d[s] = 0.f;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    pq.push({0.f, s});
    while (!pq.empty()) {
      auto [du, u] = pq.top();
      pq.pop();
      if (du > d[u]) continue;
      for (int32_t e = adj_start[u]; e < adj_start[u + 1]; ++e) {
        const int32_t v = adj_to[e];
        const float nd = du + adj_w[e];
        if (nd < d[v]) {
          d[v] = nd;
          first[v] = (u == s) ? v : first[u];
          pq.push({nd, v});
        }
      }
    }
    memcpy(dist + (int64_t)s * n, d.data(), n * sizeof(float));
    memcpy(next_hop + (int64_t)s * n, first.data(), n * sizeof(int32_t));
  }
}

}  // extern "C"
