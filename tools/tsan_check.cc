// ThreadSanitizer harness: drives every threaded pipeline in the library
// (pass-1 slice walkers, sectioned/chunked model+encode pool, the shared
// nz-mode probe threads, chunk-parallel decompress) in one process so TSAN
// can watch them. Build + run (tests/test_coder.py::test_tsan_clean does
// this when ARTC_TSAN=1):
//
//   g++ -fsanitize=thread -O1 -g -I avrecode_tpu/native \
//       -o /tmp/tsan_check avrecode_tpu/native/recode.cc tools/tsan_check.cc \
//       -lpthread
//   /tmp/tsan_check <clip> ...
//
// Exits 0 on bit-exact roundtrips; TSAN itself exits non-zero on a race.
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

#include "recode.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: tsan_check <clip> [clip ...]\n");
    return 2;
  }
  for (int a = 1; a < argc; ++a) {
    std::ifstream f(argv[a], std::ios::binary);
    std::vector<uint8_t> data((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
    if (data.empty()) {
      fprintf(stderr, "cannot read %s\n", argv[a]);
      return 2;
    }
    for (int chunk_mode = 0; chunk_mode <= 1; ++chunk_mode) {
      artc::Options opt;
      opt.chunk_mode = chunk_mode;
      opt.batch_size = 1024;
      opt.section_bins = 50000;  // tiny sections: force the section pool
      artc::Stats st;
      auto comp = artc::compress(data.data(), data.size(), opt, &st);
      auto dec = artc::decompress(comp.data(), comp.size(), nullptr);
      if (dec != data) {
        fprintf(stderr, "roundtrip mismatch on %s (chunk_mode=%d)\n", argv[a],
                chunk_mode);
        return 1;
      }
    }
    printf("%s ok\n", argv[a]);
  }
  return 0;
}
