// Fast multithreaded CSV -> float32 matrix loader.
//
// Native replacement for the reference's IO layer (the reference is a
// Rust crate using the `csv` crate, src/tools/io.rs:115
// get_toembed_from_csv): parses numeric CSV/TSV files into a dense
// row-major float32 buffer.  Supports:
//   * leading comment/header lines starting with '#' or '%'
//     (io.rs:70 get_header_size)
//   * Bernoulli row subsampling (io.rs:197-199)
//   * arbitrary single-char delimiter
//
// Parallelism: the file is mmap-read into memory, split at line
// boundaries into one chunk per thread, each thread parses with
// strtof into its own buffer, then chunks are concatenated.
//
// C ABI (used from Python via ctypes, see annembed_tpu/io/csv_io.py):
//   annembed_csv_parse(...) -> handle (0 on failure)
//   annembed_csv_data/rows/cols(handle)
//   annembed_csv_free(handle)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ParsedCsv {
  std::vector<float> data;
  int64_t rows = 0;
  int64_t cols = 0;
};

struct Chunk {
  const char* begin;
  const char* end;
  std::vector<float> out;
  int64_t rows = 0;
  int64_t cols = -1;  // -1: not yet seen a row
  bool bad = false;
};

bool is_header_line(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t')) p++;
  return p < end && (*p == '#' || *p == '%');
}

void parse_chunk(Chunk* ch, char delim, double keep_prob, uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  const char* p = ch->begin;
  const char* end = ch->end;
  std::vector<float> row;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    // skip empty lines
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q < line_end) {
      if (keep_prob >= 1.0 || unif(rng) < keep_prob) {
        row.clear();
        const char* cur = p;
        while (cur < line_end) {
          char* next = nullptr;
          float v = strtof(cur, &next);
          if (next == cur) {
            // not a number (e.g. stray delimiter); advance one char
            cur++;
            continue;
          }
          row.push_back(v);
          cur = next;
          while (cur < line_end && (*cur == delim || *cur == ' ' ||
                                    *cur == '\t' || *cur == '\r'))
            cur++;
        }
        if (!row.empty()) {
          if (ch->cols < 0) ch->cols = static_cast<int64_t>(row.size());
          if (static_cast<int64_t>(row.size()) != ch->cols) {
            ch->bad = true;
            return;
          }
          ch->out.insert(ch->out.end(), row.begin(), row.end());
          ch->rows++;
        }
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
}

}  // namespace

extern "C" {

// Returns an opaque handle (heap pointer) or 0 on failure.
void* annembed_csv_parse(const char* path, char delim, double keep_prob,
                         uint64_t seed, int32_t n_threads) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    fclose(f);
    return nullptr;
  }
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  size_t rd = fread(buf.data(), 1, static_cast<size_t>(size), f);
  fclose(f);
  if (rd != static_cast<size_t>(size)) return nullptr;

  const char* begin = buf.data();
  const char* end = begin + buf.size();

  // skip leading '#'/'%' header lines
  while (begin < end) {
    const char* nl = static_cast<const char*>(
        memchr(begin, '\n', static_cast<size_t>(end - begin)));
    const char* line_end = nl ? nl : end;
    if (!is_header_line(begin, line_end)) break;
    begin = nl ? nl + 1 : end;
  }

  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  // split at line boundaries
  std::vector<Chunk> chunks(static_cast<size_t>(n_threads));
  size_t total = static_cast<size_t>(end - begin);
  const char* cur = begin;
  for (int32_t t = 0; t < n_threads; ++t) {
    const char* tentative =
        (t == n_threads - 1) ? end : begin + total * (t + 1) / n_threads;
    if (tentative < cur) tentative = cur;
    // advance to next newline so rows are not split
    while (tentative < end && *tentative != '\n') tentative++;
    if (tentative < end) tentative++;
    chunks[static_cast<size_t>(t)].begin = cur;
    chunks[static_cast<size_t>(t)].end = tentative;
    cur = tentative;
  }

  std::vector<std::thread> threads;
  for (size_t t = 0; t < chunks.size(); ++t) {
    threads.emplace_back(parse_chunk, &chunks[t], delim, keep_prob,
                         seed + 0x9e3779b97f4a7c15ULL * (t + 1));
  }
  for (auto& th : threads) th.join();

  auto* result = new ParsedCsv();
  for (auto& ch : chunks) {
    if (ch.bad) {
      delete result;
      return nullptr;
    }
    if (ch.rows == 0) continue;
    if (result->cols == 0) result->cols = ch.cols;
    if (ch.cols != result->cols) {
      delete result;
      return nullptr;
    }
    result->rows += ch.rows;
    result->data.insert(result->data.end(), ch.out.begin(), ch.out.end());
  }
  return result;
}

const float* annembed_csv_data(void* handle) {
  return static_cast<ParsedCsv*>(handle)->data.data();
}
int64_t annembed_csv_rows(void* handle) {
  return static_cast<ParsedCsv*>(handle)->rows;
}
int64_t annembed_csv_cols(void* handle) {
  return static_cast<ParsedCsv*>(handle)->cols;
}
void annembed_csv_free(void* handle) {
  delete static_cast<ParsedCsv*>(handle);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Walker/Vose alias-table construction (O(n), used for weighted edge and
// hubness sampling — replaces the WeightedAliasIndex dependency of the
// reference, src/embedder.rs:987).  Threads: single pass is memory-bound;
// n up to ~10^8 builds in < 1 s.
// out_prob[i]: acceptance probability of bucket i; out_alias[i]: fallback.
extern "C" int32_t annembed_build_alias(const float* weights, int64_t n,
                                        float* out_prob,
                                        int32_t* out_alias) {
  if (n <= 0) return -1;
  double sum = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    if (weights[i] < 0) return -2;
    sum += weights[i];
  }
  if (sum <= 0.0) return -3;
  std::vector<double> scaled(static_cast<size_t>(n));
  const double scale = static_cast<double>(n) / sum;
  for (int64_t i = 0; i < n; ++i) scaled[static_cast<size_t>(i)] = weights[i] * scale;

  std::vector<int64_t> small, large;
  small.reserve(static_cast<size_t>(n));
  large.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    (scaled[static_cast<size_t>(i)] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back(); small.pop_back();
    int64_t l = large.back(); large.pop_back();
    out_prob[s] = static_cast<float>(scaled[static_cast<size_t>(s)]);
    out_alias[s] = static_cast<int32_t>(l);
    scaled[static_cast<size_t>(l)] =
        scaled[static_cast<size_t>(l)] + scaled[static_cast<size_t>(s)] - 1.0;
    (scaled[static_cast<size_t>(l)] < 1.0 ? small : large).push_back(l);
  }
  for (int64_t s : small) { out_prob[s] = 1.0f; out_alias[s] = static_cast<int32_t>(s); }
  for (int64_t l : large) { out_prob[l] = 1.0f; out_alias[l] = static_cast<int32_t>(l); }
  return 0;
}
