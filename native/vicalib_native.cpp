// Native data-loading runtime for vicalib_tpu.
//
// Role parity with the reference's C++ HAL layer (SURVEY.md section 2:
// hal::Camera file driver + hal::IMU csv driver): high-throughput image
// decode and measurement parsing feeding the device pipeline.  The compute
// path stays JAX/XLA; this library owns the host-side byte work, parallel
// across a thread pool.
//
// C ABI only (consumed via ctypes); no external dependencies.

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Parse a PGM header; returns offset of pixel data or -1.
long parse_pgm_header(const unsigned char* buf, long size, int* w, int* h,
                      int* maxval) {
  long i = 0;
  auto skip_ws = [&]() {
    while (i < size) {
      if (buf[i] == '#') {
        while (i < size && buf[i] != '\n') ++i;
      } else if (isspace(buf[i])) {
        ++i;
      } else {
        break;
      }
    }
  };
  if (size < 2 || buf[0] != 'P' || buf[1] != '5') return -1;
  i = 2;
  int vals[3];
  for (int k = 0; k < 3; ++k) {
    skip_ws();
    long start = i;
    while (i < size && isdigit(buf[i])) ++i;
    if (i == start) return -1;
    vals[k] = atoi(reinterpret_cast<const char*>(buf + start));
  }
  *w = vals[0];
  *h = vals[1];
  *maxval = vals[2];
  ++i;  // single whitespace after maxval
  return i;
}

int read_file(const char* path, std::vector<unsigned char>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size);
  size_t got = fread(out->data(), 1, size, f);
  fclose(f);
  return got == static_cast<size_t>(size) ? 0 : -1;
}

}  // namespace

extern "C" {

// Decode one P5 PGM into out (row-major uint8, caller allocates w*h).
// Returns 0 on success, negative on error.  w/h are in-out: if *w > 0 the
// image must match, else they receive the decoded size.
int vn_read_pgm(const char* path, uint8_t* out, int* w, int* h) {
  std::vector<unsigned char> buf;
  if (read_file(path, &buf) != 0) return -1;
  int pw, ph, maxval;
  long off = parse_pgm_header(buf.data(), static_cast<long>(buf.size()), &pw,
                              &ph, &maxval);
  if (off < 0) return -2;
  if (*w > 0 && (*w != pw || *h != ph)) return -3;
  *w = pw;
  *h = ph;
  long n = static_cast<long>(pw) * ph;
  if (maxval < 256) {
    if (static_cast<long>(buf.size()) - off < n) return -4;
    memcpy(out, buf.data() + off, n);
  } else {
    if (static_cast<long>(buf.size()) - off < 2 * n) return -4;
    const unsigned char* p = buf.data() + off;
    for (long k = 0; k < n; ++k) out[k] = p[2 * k];  // big-endian high byte
  }
  return 0;
}

// Decode n PGM files (null-separated concatenated paths) in parallel into a
// contiguous (n, h, w) uint8 buffer.  Returns number of failures.
int vn_read_pgm_batch(const char* paths, int n, uint8_t* out, int w, int h,
                      int nthreads) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int k = 0; k < n; ++k) {
    files[k] = p;
    p += strlen(p) + 1;
  }
  std::atomic<int> next(0), failures(0);
  long stride = static_cast<long>(w) * h;
  auto worker = [&]() {
    for (;;) {
      int k = next.fetch_add(1);
      if (k >= n) break;
      int ww = w, hh = h;
      if (vn_read_pgm(files[k], out + stride * k, &ww, &hh) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  int nt = nthreads > 0 ? nthreads
                        : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Parse whitespace-separated doubles; returns count written (<= max_count),
// negative on IO error.
long vn_read_doubles(const char* path, double* out, long max_count) {
  std::vector<unsigned char> buf;
  if (read_file(path, &buf) != 0) return -1;
  buf.push_back('\0');
  char* s = reinterpret_cast<char*>(buf.data());
  long count = 0;
  while (*s && count < max_count) {
    char* end = nullptr;
    // skip comment lines (e.g. '%' or '#' prefixed)
    while (*s && (isspace(*s))) ++s;
    if (*s == '#' || *s == '%') {
      while (*s && *s != '\n') ++s;
      continue;
    }
    double v = strtod(s, &end);
    if (end == s) break;
    out[count++] = v;
    s = end;
  }
  return count;
}

}  // extern "C"
