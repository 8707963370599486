// stress_native.cpp — TSAN/ASAN stress driver for the first-party native
// runtime (medtok_graph.cpp, wordpiece.cpp).
//
// The reference ships zero first-party native code (SURVEY.md §2.9); this
// rebuild's data path is threaded C++, so it gets what the reference never
// needed: a sanitizer harness. The driver exercises every threaded entry
// point under BOTH kinds of concurrency at once:
//   - internal thread pools (run_truncating_ranges / wp_encode_batch spawn
//     workers per call; MEDTOK_PACK_THREADS=8 forces pools on 1-core boxes);
//   - external concurrency: several driver threads hammer the SAME Graph /
//     Vocab handle and the same read-only node arena simultaneously, each
//     with private output buffers — the real usage pattern (dataset readers
//     share the CSR graph).
// Build+run via scripts/sanitize_native.sh (-fsanitize=thread and
// -fsanitize=address,undefined). Exits non-zero on any invariant violation;
// sanitizer findings abort the process by themselves.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* medtok_graph_build(const int64_t*, const int64_t*, const int32_t*,
                         int64_t, int64_t);
void medtok_graph_free(void*);
int64_t medtok_graph_subgraph(const void*, const int64_t*, int64_t, int32_t*,
                              int32_t*, int32_t*, int64_t);
int64_t medtok_graph_pack_batch(const void*, const int64_t*, const int64_t*,
                                int64_t, int64_t, int64_t, double, uint64_t,
                                int32_t*, uint8_t*, int32_t*, int32_t*, float*,
                                int32_t*, int32_t*, float*);
int64_t medtok_graph_pack_compact(const void*, const int64_t*, const int64_t*,
                                  int64_t, int64_t, int64_t, double, uint64_t,
                                  int32_t*, uint8_t*, int32_t*, int32_t*,
                                  int32_t*, int32_t*);
int64_t medtok_graph_pack_compact_idx(const void*, const int32_t*,
                                      const int64_t*, const int64_t*, int64_t,
                                      int64_t, int64_t, double, uint64_t,
                                      int32_t*, uint8_t*, int32_t*, int32_t*,
                                      int32_t*, int32_t*);
int64_t medtok_graph_pack_stream_idx(const void*, const int32_t*,
                                     const int64_t*, const int64_t*, int64_t,
                                     int64_t, int64_t, double, uint64_t,
                                     int32_t*, uint8_t*, uint16_t*, uint16_t*,
                                     int32_t*, uint16_t*, uint16_t*, int32_t*);
int64_t medtok_graph_pack_compact16(const void*, const int64_t*,
                                    const int64_t*, int64_t, int64_t, int64_t,
                                    double, uint64_t, int32_t*, uint8_t*,
                                    uint16_t*, int32_t*, uint16_t*, int32_t*);
int64_t medtok_graph_pack_compact_idx16(const void*, const int32_t*,
                                        const int64_t*, const int64_t*,
                                        int64_t, int64_t, int64_t, double,
                                        uint64_t, int32_t*, uint8_t*,
                                        uint16_t*, int32_t*, uint16_t*,
                                        int32_t*);
void medtok_graph_count_edges(const void*, const int32_t*, const int64_t*,
                              int64_t, int64_t, int64_t, int32_t*);
void* medtok_wp_build(const char*, int64_t);
void medtok_wp_free(void*);
int64_t medtok_wp_encode(const void*, const char*, int64_t, int32_t*, int64_t);
int64_t medtok_wp_encode_batch(const void*, const char*, const int64_t*,
                               int64_t, int32_t*, int64_t*, int64_t, int32_t);
}

namespace {

constexpr int64_t kNodes = 20000;
constexpr int64_t kEdges = 200000;
constexpr int64_t kBatch = 512;
constexpr int64_t kLn = 64;     // <= 256 so the uint16 packers are legal
constexpr int64_t kEpg = 128;
constexpr int kDriverThreads = 4;
constexpr int kIters = 6;

std::atomic<int> failures{0};

void check(bool ok, const char* what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    failures.fetch_add(1);
  }
}

struct Lists {
  std::vector<int64_t> data;     // concatenated sorted node lists (int64)
  std::vector<int64_t> off;      // [B+1]
  std::vector<int32_t> arena32;  // same lists as an int32 arena
  std::vector<int64_t> idxs;     // identity row indices
};

Lists make_lists(uint64_t seed) {
  Lists L;
  std::mt19937_64 rng(seed);
  L.off.push_back(0);
  for (int64_t b = 0; b < kBatch; b++) {
    int64_t n = 1 + static_cast<int64_t>(rng() % kLn);
    // contiguous run with random stride: sorted + unique by construction
    int64_t stride = 1 + static_cast<int64_t>(rng() % 3);
    int64_t start = static_cast<int64_t>(rng() % (kNodes - stride * n));
    for (int64_t i = 0; i < n; i++) L.data.push_back(start + stride * i);
    L.off.push_back(static_cast<int64_t>(L.data.size()));
    L.idxs.push_back(b);
  }
  L.arena32.reserve(L.data.size());
  for (int64_t v : L.data) L.arena32.push_back(static_cast<int32_t>(v));
  return L;
}

void graph_worker(const void* g, const Lists& L, uint64_t seed) {
  std::vector<int32_t> node_ids(kBatch * kLn);
  std::vector<uint8_t> node_mask(kBatch * kLn);
  std::vector<int32_t> es(kBatch * kEpg), ed(kBatch * kEpg);
  std::vector<float> ew(kBatch * kEpg), ewa(kBatch * kEpg);
  std::vector<int32_t> esa(kBatch * kEpg), eda(kBatch * kEpg);
  std::vector<int32_t> packed(kBatch * kEpg), packed_aug(kBatch * kEpg);
  std::vector<uint16_t> p16(kBatch * kEpg), p16a(kBatch * kEpg);
  std::vector<uint16_t> outdeg(kBatch * kLn), outdeg_aug(kBatch * kLn);
  std::vector<uint16_t> ds(kBatch * kEpg), dsa(kBatch * kEpg);
  std::vector<int32_t> ne(kBatch), nea(kBatch), counts(kBatch);

  for (int it = 0; it < kIters; it++) {
    uint64_t s = seed * 1000003ULL + static_cast<uint64_t>(it);
    int64_t t1 = medtok_graph_pack_batch(
        g, L.data.data(), L.off.data(), kBatch, kLn, kEpg, 0.1, s,
        node_ids.data(), node_mask.data(), es.data(), ed.data(), ew.data(),
        esa.data(), eda.data(), ewa.data());
    check(t1 >= 0, "pack_batch truncation count");
    // aliased-aug skip path (eval/export)
    int64_t t1b = medtok_graph_pack_batch(
        g, L.data.data(), L.off.data(), kBatch, kLn, kEpg, 0.0, s,
        node_ids.data(), node_mask.data(), es.data(), ed.data(), ew.data(),
        es.data(), ed.data(), ew.data());
    check(t1b >= 0, "pack_batch aliased-aug");
    int64_t t2 = medtok_graph_pack_compact(
        g, L.data.data(), L.off.data(), kBatch, kLn, kEpg, 0.1, s,
        node_ids.data(), node_mask.data(), packed.data(), ne.data(),
        packed_aug.data(), nea.data());
    check(t2 >= 0, "pack_compact");
    int64_t t3 = medtok_graph_pack_compact_idx(
        g, L.arena32.data(), L.off.data(), L.idxs.data(), kBatch, kLn, kEpg,
        0.1, s, node_ids.data(), node_mask.data(), packed.data(), ne.data(),
        packed_aug.data(), nea.data());
    check(t3 == t2, "pack_compact_idx == pack_compact truncations");
    int64_t t4 = medtok_graph_pack_stream_idx(
        g, L.arena32.data(), L.off.data(), L.idxs.data(), kBatch, kLn, kEpg,
        0.1, s, node_ids.data(), node_mask.data(), outdeg.data(), ds.data(),
        ne.data(), outdeg_aug.data(), dsa.data(), nea.data());
    check(t4 >= 0, "pack_stream_idx");
    int64_t t5 = medtok_graph_pack_compact16(
        g, L.data.data(), L.off.data(), kBatch, kLn, kEpg, 0.1, s,
        node_ids.data(), node_mask.data(), p16.data(), ne.data(), p16a.data(),
        nea.data());
    check(t5 >= 0, "pack_compact16");
    int64_t t6 = medtok_graph_pack_compact_idx16(
        g, L.arena32.data(), L.off.data(), L.idxs.data(), kBatch, kLn, kEpg,
        0.1, s, node_ids.data(), node_mask.data(), p16.data(), ne.data(),
        p16a.data(), nea.data());
    check(t6 == t5, "pack_compact_idx16 == pack_compact16 truncations");
    medtok_graph_count_edges(g, L.arena32.data(), L.off.data(), 0, kBatch,
                             kLn, counts.data());
    for (int64_t b = 0; b < kBatch; b++) {
      int64_t expect = counts[b] < kEpg ? counts[b] : kEpg;
      check(ne[b] == expect, "count_edges consistent with packed ne");
      if (ne[b] != expect) return;
    }
  }
}

void wp_worker(const void* v, const std::string& blob,
               const std::vector<int64_t>& offs, int iters) {
  int64_t n = static_cast<int64_t>(offs.size()) - 1;
  std::vector<int32_t> out(n * 32);
  std::vector<int64_t> lens(n);
  for (int it = 0; it < iters; it++) {
    int64_t rejects = medtok_wp_encode_batch(
        v, blob.data(), offs.data(), n, out.data(), lens.data(), 32, 8);
    check(rejects == 1, "exactly the one non-ASCII text rejects");
    // single-text path concurrently with the pooled path
    int32_t one[32];
    int64_t m = medtok_wp_encode(v, "acute renal failure", 19, one, 32);
    check(m >= 3, "encode_one token count");
  }
}

}  // namespace

int main() {
  // deterministic random graph
  std::mt19937_64 rng(42);
  std::vector<int64_t> src(kEdges), dst(kEdges);
  std::vector<int32_t> rel(kEdges);
  for (int64_t e = 0; e < kEdges; e++) {
    src[e] = static_cast<int64_t>(rng() % kNodes);
    dst[e] = static_cast<int64_t>(rng() % kNodes);
    rel[e] = static_cast<int32_t>(rng() % 16);
  }
  void* g = medtok_graph_build(src.data(), dst.data(), rel.data(), kEdges,
                               kNodes);
  Lists L = make_lists(7);

  const char* words[] = {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "acute",
                         "renal",  "failure", "card", "##iac", "##itis",
                         "a", "b", "c", "##a", "##b", "##c"};
  std::string vocab_blob;
  for (const char* w : words) {
    vocab_blob += w;
    vocab_blob += '\n';
  }
  void* v = medtok_wp_build(vocab_blob.data(),
                            static_cast<int64_t>(vocab_blob.size()));
  std::string blob;
  std::vector<int64_t> offs{0};
  for (int i = 0; i < 2000; i++) {
    blob += (i % 3 == 0) ? "acute renal failure" : "cardiac carditis abc";
    offs.push_back(static_cast<int64_t>(blob.size()));
  }
  blob += "caf\xc3\xa9";  // one non-ASCII reject
  offs.push_back(static_cast<int64_t>(blob.size()));

  std::vector<std::thread> threads;
  for (int t = 0; t < kDriverThreads; t++) {
    threads.emplace_back(graph_worker, g, std::cref(L),
                         static_cast<uint64_t>(t));
    threads.emplace_back(wp_worker, v, std::cref(blob), std::cref(offs),
                         kIters);
  }
  for (auto& th : threads) th.join();

  medtok_graph_free(g);
  medtok_wp_free(v);
  if (failures.load() != 0) {
    std::fprintf(stderr, "stress_native: %d invariant failures\n",
                 failures.load());
    return 1;
  }
  std::puts("stress_native: all invariants held");
  return 0;
}
