// Profiling driver: run the full host compress path N times on a file so
// gprof/-pg or external timing can attribute cost inside the hot loops.
// Usage: prof_compress <file> [reps=3] [batch=4096]
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <sys/resource.h>
#include <vector>

extern "C" {
int artc_compress(const uint8_t* data, size_t size, int lanes, int chunk_mode,
                  uint32_t batch_size, int model_profile, uint8_t** out,
                  size_t* out_len, void* stats);
void artc_free(uint8_t* p);
const char* artc_last_error();
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <file> [reps] [batch]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(sz);
  if (fread(data.data(), 1, sz, f) != size_t(sz)) { fclose(f); return 2; }
  fclose(f);
  int reps = argc > 2 ? atoi(argv[2]) : 3;
  int batch = argc > 3 ? atoi(argv[3]) : 4096;
  size_t out_len = 0;
  double best = 1e30, best_cpu = 1e30;
  auto cpu_s = [] {
    rusage r;
    getrusage(RUSAGE_SELF, &r);
    return r.ru_utime.tv_sec + r.ru_utime.tv_usec * 1e-6 + r.ru_stime.tv_sec +
           r.ru_stime.tv_usec * 1e-6;
  };
  for (int i = 0; i < reps; ++i) {
    uint8_t* out = nullptr;
    double c0 = cpu_s();
    auto t0 = std::chrono::steady_clock::now();
    if (artc_compress(data.data(), data.size(), 4, 0, uint32_t(batch), 0,
                      &out, &out_len, nullptr) != 0) {
      fprintf(stderr, "compress failed: %s\n", artc_last_error());
      return 1;
    }
    double s = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    double c = cpu_s() - c0;
    if (s < best) best = s;
    if (c < best_cpu) best_cpu = c;  // CPU time: the stable work metric on a noisy VM
    artc_free(out);
  }
  printf("ok %zu -> %zu  best %.3fs  cpu %.3fs  %.3f MB/s  ratio %.5f\n",
         data.size(), out_len, best, best_cpu, data.size() / 1e6 / best,
         double(out_len) / double(data.size()));
  return 0;
}
