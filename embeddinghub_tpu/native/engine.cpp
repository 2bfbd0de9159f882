// Native runtime components for embeddinghub_tpu.
//
// Rebuilds the reference's C++ engine pieces on this side of the stack
// (reference: embeddinghub/embeddingstore/{storage,serializer,iterator,
// index}.cc) as a single shared library with a C API consumed via
// ctypes:
//
//   * VectorArena — aligned packed float32 row storage with capacity
//     doubling and mmap-able binary snapshots (the RocksDB-replacement
//     byte store under the Python Version/FlatIndex host arena);
//   * WAL codec — append/parse of the version write-ahead-log record
//     format (same wire layout as store/persistence.py, torn-tail
//     tolerant);
//   * CpuHnsw — an independent single-threaded HNSW implementation
//     (insert + layered best-first search per Malkov & Yashunin) used
//     as the CPU baseline the BASELINE.md targets are measured against
//     and as a recall parity anchor. Written from the paper's
//     algorithm; not derived from hnswlib sources.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 engine.cpp -o libehtpu.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <string>
#include <vector>

extern "C" {

// ------------------------------------------------------------------ arena

struct Arena {
  int64_t dims = 0;
  int64_t cap = 0;
  std::vector<float> data;  // cap * dims
  std::vector<uint8_t> valid;
};

void* arena_create(int64_t dims, int64_t cap) {
  Arena* a = new Arena();
  a->dims = dims;
  a->cap = cap > 0 ? cap : 128;
  a->data.assign(static_cast<size_t>(a->cap * dims), 0.0f);
  a->valid.assign(static_cast<size_t>(a->cap), 0);
  return a;
}

void arena_free(void* h) { delete static_cast<Arena*>(h); }

int64_t arena_capacity(void* h) { return static_cast<Arena*>(h)->cap; }

void arena_reserve(void* h, int64_t need) {
  Arena* a = static_cast<Arena*>(h);
  if (need <= a->cap) return;
  int64_t cap = a->cap;
  while (cap < need) cap *= 2;
  a->data.resize(static_cast<size_t>(cap * a->dims), 0.0f);
  a->valid.resize(static_cast<size_t>(cap), 0);
  a->cap = cap;
}

void arena_set(void* h, const int64_t* rows, const float* vecs, int64_t n) {
  Arena* a = static_cast<Arena*>(h);
  if (n <= 0) return;
  int64_t maxrow = 0;
  for (int64_t i = 0; i < n; i++) maxrow = std::max(maxrow, rows[i]);
  arena_reserve(h, maxrow + 1);
  for (int64_t i = 0; i < n; i++) {
    std::memcpy(&a->data[rows[i] * a->dims], &vecs[i * a->dims],
                sizeof(float) * a->dims);
    a->valid[rows[i]] = 1;
  }
}

void arena_invalidate(void* h, const int64_t* rows, int64_t n) {
  Arena* a = static_cast<Arena*>(h);
  for (int64_t i = 0; i < n; i++)
    if (rows[i] >= 0 && rows[i] < a->cap) a->valid[rows[i]] = 0;
}

void arena_get(void* h, const int64_t* rows, float* out, int64_t n) {
  Arena* a = static_cast<Arena*>(h);
  for (int64_t i = 0; i < n; i++)
    std::memcpy(&out[i * a->dims], &a->data[rows[i] * a->dims],
                sizeof(float) * a->dims);
}

float* arena_data(void* h) { return static_cast<Arena*>(h)->data.data(); }
uint8_t* arena_valid(void* h) { return static_cast<Arena*>(h)->valid.data(); }

// Snapshot layout: magic u64, dims i64, cap i64, data floats, valid bytes.
static const uint64_t kArenaMagic = 0x45485450554152ULL;  // "EHTPUAR"

int arena_save(void* h, const char* path) {
  Arena* a = static_cast<Arena*>(h);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int ok = 1;
  ok &= std::fwrite(&kArenaMagic, 8, 1, f) == 1;
  ok &= std::fwrite(&a->dims, 8, 1, f) == 1;
  ok &= std::fwrite(&a->cap, 8, 1, f) == 1;
  ok &= std::fwrite(a->data.data(), sizeof(float), a->data.size(), f) ==
        a->data.size();
  ok &= std::fwrite(a->valid.data(), 1, a->valid.size(), f) == a->valid.size();
  std::fclose(f);
  return ok ? 0 : -2;
}

void* arena_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint64_t magic = 0;
  int64_t dims = 0, cap = 0;
  if (std::fread(&magic, 8, 1, f) != 1 || magic != kArenaMagic ||
      std::fread(&dims, 8, 1, f) != 1 || std::fread(&cap, 8, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  Arena* a = static_cast<Arena*>(arena_create(dims, cap));
  size_t nd = static_cast<size_t>(cap * dims);
  if (std::fread(a->data.data(), sizeof(float), nd, f) != nd ||
      std::fread(a->valid.data(), 1, static_cast<size_t>(cap), f) !=
          static_cast<size_t>(cap)) {
    std::fclose(f);
    arena_free(a);
    return nullptr;
  }
  std::fclose(f);
  return a;
}

// -------------------------------------------------------------- WAL codec

// Record layout (little endian), matching store/persistence.py:
//   u8 tag (1=set, 2=delete, 3=freeze)
//   set:    u32 key_len, key bytes, u32 dims, dims*f32
//   delete: u32 key_len, key bytes

int wal_append_set_batch(const char* path, const char* keys,
                         const int32_t* key_lens, const float* vecs,
                         int64_t n, int64_t dims) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return -1;
  const char* kp = keys;
  uint32_t d32 = static_cast<uint32_t>(dims);
  for (int64_t i = 0; i < n; i++) {
    uint8_t tag = 1;
    uint32_t kl = static_cast<uint32_t>(key_lens[i]);
    std::fwrite(&tag, 1, 1, f);
    std::fwrite(&kl, 4, 1, f);
    std::fwrite(kp, 1, kl, f);
    std::fwrite(&d32, 4, 1, f);
    std::fwrite(&vecs[i * dims], sizeof(float), dims, f);
    kp += kl;
  }
  std::fclose(f);
  return 0;
}

// Parse a WAL: fills out_* arrays sized by a first counting pass.
// Returns number of set-records; delete/freeze records are exposed via
// the tags array so Python can replay order-faithfully.
int64_t wal_count_records(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 0;
  int64_t count = 0;
  for (;;) {
    uint8_t tag;
    if (std::fread(&tag, 1, 1, f) != 1) break;
    if (tag == 1 || tag == 2) {
      uint32_t kl;
      if (std::fread(&kl, 4, 1, f) != 1) break;
      if (std::fseek(f, kl, SEEK_CUR) != 0) break;
      if (tag == 1) {
        uint32_t d;
        if (std::fread(&d, 4, 1, f) != 1) break;
        if (std::fseek(f, 4L * d, SEEK_CUR) != 0) break;
      }
    } else if (tag != 3) {
      break;  // corrupt tail
    }
    count++;
  }
  std::fclose(f);
  return count;
}

// ------------------------------------------------------------- CPU HNSW

struct CpuHnsw {
  int dims, M, M0, efC;
  bool ip;  // true: 1-dot distance (vectors pre-normalized for cosine)
  double mult;
  std::mt19937_64 rng;
  std::vector<float> data;
  std::vector<int> level;
  // links[node] = flat per-layer adjacency: layer l block at offset
  std::vector<std::vector<std::vector<int>>> links;
  std::vector<uint32_t> visit_stamp;
  uint32_t stamp = 0;
  int entry = -1, max_level = -1;

  float dist(const float* a, const float* b) const {
    float acc = 0.f;
    if (ip) {
      for (int i = 0; i < dims; i++) acc += a[i] * b[i];
      return 1.0f - acc;
    }
    for (int i = 0; i < dims; i++) {
      float t = a[i] - b[i];
      acc += t * t;
    }
    return acc;
  }
  const float* vec(int id) const { return &data[(size_t)id * dims]; }
};

void* hnsw_create(int dims, int M, int efC, int ip_metric, uint64_t seed) {
  CpuHnsw* h = new CpuHnsw();
  h->dims = dims;
  h->M = M;
  h->M0 = 2 * M;
  h->efC = efC;
  h->ip = ip_metric != 0;
  h->mult = 1.0 / std::log(double(M));
  h->rng.seed(seed);
  return h;
}

void hnsw_free(void* p) { delete static_cast<CpuHnsw*>(p); }
int64_t hnsw_size(void* p) {
  return static_cast<int64_t>(static_cast<CpuHnsw*>(p)->level.size());
}

typedef std::pair<float, int> DI;

// Best-first search of one layer; returns up to ef closest (max-heap order
// popped into ascending vector).
static std::vector<DI> search_layer(CpuHnsw* h, const float* q, int ep,
                                    int ef, int layer) {
  h->stamp++;
  if (h->visit_stamp.size() < h->level.size())
    h->visit_stamp.resize(h->level.size(), 0);
  std::priority_queue<DI, std::vector<DI>, std::greater<DI>> cands;  // min
  std::priority_queue<DI> best;                                      // max
  float d0 = h->dist(q, h->vec(ep));
  cands.push({d0, ep});
  best.push({d0, ep});
  h->visit_stamp[ep] = h->stamp;
  while (!cands.empty()) {
    DI c = cands.top();
    if (c.first > best.top().first && (int)best.size() >= ef) break;
    cands.pop();
    const auto& nbrs = h->links[c.second][layer];
    for (int nb : nbrs) {
      if (h->visit_stamp[nb] == h->stamp) continue;
      h->visit_stamp[nb] = h->stamp;
      float d = h->dist(q, h->vec(nb));
      if ((int)best.size() < ef || d < best.top().first) {
        cands.push({d, nb});
        best.push({d, nb});
        if ((int)best.size() > ef) best.pop();
      }
    }
  }
  std::vector<DI> out(best.size());
  for (int i = (int)best.size() - 1; i >= 0; i--) {
    out[i] = best.top();
    best.pop();
  }
  return out;
}

// Neighbor-selection heuristic: keep candidate c iff closer to q than to
// any already-kept neighbor.
static std::vector<int> select_heuristic(CpuHnsw* h, std::vector<DI>& cands,
                                         int m) {
  std::sort(cands.begin(), cands.end());
  std::vector<int> kept;
  for (auto& [dq, c] : cands) {
    if ((int)kept.size() >= m) break;
    bool ok = true;
    for (int s : kept) {
      if (h->dist(h->vec(c), h->vec(s)) < dq) {
        ok = false;
        break;
      }
    }
    if (ok) kept.push_back(c);
  }
  return kept;
}

static void prune_node(CpuHnsw* h, int node, int layer, int mmax) {
  auto& lst = h->links[node][layer];
  if ((int)lst.size() <= mmax) return;
  std::vector<DI> cands;
  cands.reserve(lst.size());
  for (int nb : lst) cands.push_back({h->dist(h->vec(node), h->vec(nb)), nb});
  lst = select_heuristic(h, cands, mmax);
}

void hnsw_add(void* p, const float* vecs, int64_t n) {
  CpuHnsw* h = static_cast<CpuHnsw*>(p);
  for (int64_t i = 0; i < n; i++) {
    int id = (int)h->level.size();
    h->data.insert(h->data.end(), &vecs[i * h->dims],
                   &vecs[(i + 1) * h->dims]);
    std::uniform_real_distribution<double> U(1e-12, 1.0);
    int lvl = (int)(-std::log(U(h->rng)) * h->mult);
    h->level.push_back(lvl);
    h->links.emplace_back(lvl + 1);
    const float* q = h->vec(id);

    if (h->entry < 0) {
      h->entry = id;
      h->max_level = lvl;
      continue;
    }
    int ep = h->entry;
    // greedy descent through layers above lvl
    for (int lc = h->max_level; lc > lvl; lc--) {
      bool improved = true;
      float dcur = h->dist(q, h->vec(ep));
      while (improved) {
        improved = false;
        for (int nb : h->links[ep][lc]) {
          float d = h->dist(q, h->vec(nb));
          if (d < dcur) {
            dcur = d;
            ep = nb;
            improved = true;
          }
        }
      }
    }
    for (int lc = std::min(lvl, h->max_level); lc >= 0; lc--) {
      auto cands = search_layer(h, q, ep, h->efC, lc);
      ep = cands.front().second;  // nearest for next layer down
      int mmax = lc == 0 ? h->M0 : h->M;
      auto sel = select_heuristic(h, cands, h->M);
      h->links[id][lc] = sel;
      for (int nb : sel) {
        h->links[nb][lc].push_back(id);
        prune_node(h, nb, lc, mmax);
      }
    }
    if (lvl > h->max_level) {
      h->max_level = lvl;
      h->entry = id;
    }
  }
}

void hnsw_search(void* p, const float* queries, int64_t nq, int k, int ef,
                 int64_t* out_ids, float* out_dists) {
  CpuHnsw* h = static_cast<CpuHnsw*>(p);
  if (ef < k) ef = k;
  for (int64_t qi = 0; qi < nq; qi++) {
    const float* q = &queries[qi * h->dims];
    int ep = h->entry;
    if (ep < 0) {
      for (int j = 0; j < k; j++) {
        out_ids[qi * k + j] = -1;
        out_dists[qi * k + j] = INFINITY;
      }
      continue;
    }
    for (int lc = h->max_level; lc > 0; lc--) {
      bool improved = true;
      float dcur = h->dist(q, h->vec(ep));
      while (improved) {
        improved = false;
        for (int nb : h->links[ep][lc]) {
          float d = h->dist(q, h->vec(nb));
          if (d < dcur) {
            dcur = d;
            ep = nb;
            improved = true;
          }
        }
      }
    }
    auto res = search_layer(h, q, ep, ef, 0);
    for (int j = 0; j < k; j++) {
      if (j < (int)res.size()) {
        out_ids[qi * k + j] = res[j].second;
        out_dists[qi * k + j] = res[j].first;
      } else {
        out_ids[qi * k + j] = -1;
        out_dists[qi * k + j] = INFINITY;
      }
    }
  }
}

// ---- graph introspection (diagnostics / graph import into the TPU index)

int hnsw_entry(void* p) { return static_cast<CpuHnsw*>(p)->entry; }
int hnsw_max_level(void* p) { return static_cast<CpuHnsw*>(p)->max_level; }

void hnsw_levels(void* p, int* out) {
  CpuHnsw* h = static_cast<CpuHnsw*>(p);
  for (size_t i = 0; i < h->level.size(); i++) out[i] = h->level[i];
}

// Fill out[n * width] with layer adjacency, -1 padded / truncated at width.
void hnsw_links_layer(void* p, int layer, int width, int* out) {
  CpuHnsw* h = static_cast<CpuHnsw*>(p);
  int64_t n = (int64_t)h->level.size();
  for (int64_t i = 0; i < n; i++) {
    int m = 0;
    if (h->level[i] >= layer) {
      const auto& lst = h->links[i][layer];
      for (; m < (int)lst.size() && m < width; m++) out[i * width + m] = lst[m];
    }
    for (; m < width; m++) out[i * width + m] = -1;
  }
}

}  // extern "C"
