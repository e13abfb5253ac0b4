// ThreadSanitizer harness for the native host layer (survey §5.2).
//
// The reference ships real data races (`start_` plain-bool across 4
// threads, FUSION.cpp:135; unguarded downloadData, FUSION.cpp:398).  This
// framework keeps all device state functional, so the only native
// concurrency left is (a) the OpenMP parallel-for inside hf_decode_xyzrgb
// and (b) callers decoding/exporting different frames from different host
// threads.  This harness drives both patterns under TSAN; a data race makes
// the process exit nonzero (TSAN default exitcode=66).
//
// Build + run: `make tsan_check && ./tsan_check` (see Makefile), or via
// tests/test_native_oracle.py::test_tsan_clean.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void hf_decode_xyzrgb(const uint8_t*, int64_t, int64_t, int64_t, int64_t,
                      int64_t, int64_t, int, float*, float*);
int64_t hf_zclip_compact(const float*, const float*, int64_t, float, float,
                         float*, float*);
int hf_write_ascii_table(const char*, const char*, const float*, int64_t,
                         int64_t, int);
}

namespace {

constexpr int64_t kPoints = 20000;
constexpr int64_t kStep = 16;  // x,y,z,rgb float32

void fill_blob(std::vector<uint8_t>& blob, unsigned seed) {
  blob.resize(kPoints * kStep);
  unsigned s = seed * 2654435761u + 1u;
  for (int64_t i = 0; i < kPoints; ++i) {
    float v[4];
    for (int j = 0; j < 4; ++j) {
      s = s * 1664525u + 1013904223u;
      v[j] = (float)(s & 0xffff) / 65536.0f;
    }
    std::memcpy(blob.data() + i * kStep, v, 16);
  }
}

void worker(int tid, const char* dir) {
  std::vector<uint8_t> blob;
  fill_blob(blob, (unsigned)tid);
  std::vector<float> xyz(3 * kPoints), rgb(3 * kPoints);
  std::vector<float> cx(3 * kPoints), cr(3 * kPoints);
  for (int rep = 0; rep < 4; ++rep) {
    // (a) OMP parallel decode inside one call
    hf_decode_xyzrgb(blob.data(), kPoints, kStep, 0, 4, 8, 12, 0,
                     xyz.data(), rgb.data());
    int64_t kept = hf_zclip_compact(xyz.data(), rgb.data(), kPoints, 0.1f,
                                    0.9f, cx.data(), cr.data());
    // (b) per-thread export to distinct files
    char path[256];
    std::snprintf(path, sizeof(path), "%s/tsan_out_%d.txt", dir, tid);
    hf_write_ascii_table(path, "# tsan\n", cx.data(), kept, 3, 0);
  }
}

}  // namespace

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "/tmp";
  std::vector<std::thread> ts;
  for (int t = 0; t < 4; ++t) ts.emplace_back(worker, t, dir);
  for (auto& t : ts) t.join();
  std::puts("tsan_check: done");
  return 0;
}
