// Fast multithreaded CSV -> float32 matrix loader.
//
// Native replacement for the reference's IO layer (the reference is a
// Rust crate using the `csv` crate, src/tools/io.rs:115
// get_toembed_from_csv): parses numeric CSV/TSV files into a dense
// row-major float32 buffer.  Supports:
//   * leading comment/header lines starting with '#' or '%'
//     (io.rs:70 get_header_size)
//   * Bernoulli row subsampling (io.rs:197-199) — the keep/drop
//     decision hashes (seed, line byte offset), so the SAME rows are
//     selected regardless of thread count, chunk boundaries, or
//     whether the numpy fallback parses the file (csv_io.py mirrors
//     the hash)
//   * arbitrary single-char delimiter; runs of blanks collapse only
//     when the delimiter itself is a blank
//
// STRICT parsing: every field must be a complete finite-syntax float
// (std::from_chars — locale-independent, unlike strtof).  Empty
// fields, text tokens, or ragged rows abort the parse (handle 0) so
// the Python side fails loudly instead of silently shifting columns.
//
// Parallelism: the file is mmap'd (fread fallback), split at line
// boundaries into one chunk per thread, each thread parses into its
// own buffer, then chunks are concatenated (each chunk's buffer is
// released right after its copy to bound peak memory).
//
// C ABI (used from Python via ctypes, see annembed_tpu/io/csv_io.py):
//   annembed_csv_parse(...) -> handle (0 on failure)
//   annembed_csv_data/rows/cols(handle)
//   annembed_csv_free(handle)

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct ParsedCsv {
  std::vector<float> data;
  int64_t rows = 0;
  int64_t cols = 0;
};

struct Chunk {
  const char* begin;
  const char* end;
  const char* base;  // file start: line offsets are measured from here
  std::vector<float> out;
  int64_t rows = 0;
  int64_t cols = -1;  // -1: not yet seen a row
  bool bad = false;
};

bool is_header_line(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t')) p++;
  return p < end && (*p == '#' || *p == '%');
}

// splitmix64-style keep/drop hash over (seed, byte offset of the line).
// Mirrored bit-for-bit by annembed_tpu/io/csv_io.py::_keep_row so the
// native and numpy paths subsample identical rows.
inline bool keep_row(uint64_t seed, uint64_t offset, double keep_prob) {
  uint64_t z = offset + 0x9E3779B97F4A7C15ULL * (seed + 1ULL);
  z ^= z >> 30;
  z *= 0xBF58476D1CE4E5B9ULL;
  z ^= z >> 27;
  z *= 0x94D049BB133111EBULL;
  z ^= z >> 31;
  return static_cast<double>(z >> 11) * (1.0 / 9007199254740992.0)
      < keep_prob;
}

// Parse one complete field [b, e) (already trimmed); strict: the whole
// field must be consumed.  from_chars rejects a leading '+', which
// strtof accepted — allow it explicitly.
inline bool parse_field(const char* b, const char* e, float* out) {
  if (b < e && *b == '+') b++;
  if (b >= e) return false;
  auto res = std::from_chars(b, e, *out);
  return res.ec == std::errc() && res.ptr == e;
}

// Strict line tokenizer: exactly one value per delimiter-separated
// field (runs collapse only for blank delimiters).  Returns false on
// any malformed/empty field.
bool parse_line(const char* p, const char* line_end, char delim,
                std::vector<float>* row) {
  const bool ws_delim = (delim == ' ' || delim == '\t');
  const char* cur = p;
  if (ws_delim) {
    while (cur < line_end &&
           (*cur == ' ' || *cur == '\t' || *cur == '\r'))
      cur++;
    while (cur < line_end) {
      const char* fe = cur;
      while (fe < line_end && *fe != ' ' && *fe != '\t' && *fe != '\r')
        fe++;
      float v;
      if (!parse_field(cur, fe, &v)) return false;
      row->push_back(v);
      cur = fe;
      while (cur < line_end &&
             (*cur == ' ' || *cur == '\t' || *cur == '\r'))
        cur++;
    }
    return !row->empty();
  }
  for (;;) {
    const char* fe = static_cast<const char*>(
        memchr(cur, delim, static_cast<size_t>(line_end - cur)));
    const char* fend = fe ? fe : line_end;
    // trim surrounding blanks of the field
    const char* b = cur;
    const char* e = fend;
    while (b < e && (*b == ' ' || *b == '\t')) b++;
    while (e > b && (e[-1] == ' ' || e[-1] == '\t' || e[-1] == '\r')) e--;
    float v;
    if (!parse_field(b, e, &v)) return false;  // empty field also fails
    row->push_back(v);
    if (!fe) return true;
    cur = fe + 1;
  }
}

void parse_chunk(Chunk* ch, char delim, double keep_prob, uint64_t seed) {
  const char* p = ch->begin;
  const char* end = ch->end;
  std::vector<float> row;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    // skip blank lines
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q < line_end) {
      const uint64_t off = static_cast<uint64_t>(p - ch->base);
      if (keep_prob >= 1.0 || keep_row(seed, off, keep_prob)) {
        row.clear();
        if (!parse_line(p, line_end, delim, &row) || row.empty()) {
          ch->bad = true;
          return;
        }
        if (ch->cols < 0) ch->cols = static_cast<int64_t>(row.size());
        if (static_cast<int64_t>(row.size()) != ch->cols) {
          ch->bad = true;
          return;
        }
        ch->out.insert(ch->out.end(), row.begin(), row.end());
        ch->rows++;
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
}

struct FileView {
  const char* data = nullptr;
  size_t size = 0;
  void* map = nullptr;
  std::string buf;  // fread fallback

  bool open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size <= 0) {
      close(fd);
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    map = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (map != MAP_FAILED) {
      close(fd);
      data = static_cast<const char*>(map);
      return true;
    }
    map = nullptr;
    buf.resize(size);
    size_t got = 0;
    while (got < size) {
      ssize_t rd = ::read(fd, buf.data() + got, size - got);
      if (rd <= 0) break;
      got += static_cast<size_t>(rd);
    }
    close(fd);
    if (got != size) return false;
    data = buf.data();
    return true;
  }

  ~FileView() {
    if (map) munmap(map, size);
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle (heap pointer) or 0 on failure.
void* annembed_csv_parse(const char* path, char delim, double keep_prob,
                         uint64_t seed, int32_t n_threads) {
  FileView file;
  if (!file.open(path)) return nullptr;
  const char* base = file.data;
  const char* begin = base;
  const char* end = base + file.size;

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
    chunks[static_cast<size_t>(t)].base = base;
    cur = tentative;
  }

  std::vector<std::thread> threads;
  for (size_t t = 0; t < chunks.size(); ++t) {
    threads.emplace_back(parse_chunk, &chunks[t], delim, keep_prob, seed);
  }
  for (auto& th : threads) th.join();

  auto* result = new ParsedCsv();
  int64_t total_rows = 0;
  for (auto& ch : chunks) {
    if (ch.bad) {
      delete result;
      return nullptr;
    }
    total_rows += ch.rows;
  }
  for (auto& ch : chunks) {
    if (ch.rows == 0) continue;
    if (result->cols == 0) {
      result->cols = ch.cols;
      result->data.reserve(
          static_cast<size_t>(total_rows * result->cols));
    }
    if (ch.cols != result->cols) {
      delete result;
      return nullptr;
    }
    result->rows += ch.rows;
    result->data.insert(result->data.end(), ch.out.begin(), ch.out.end());
    std::vector<float>().swap(ch.out);  // release right away: peak
                                        // memory stays ~1x parsed data
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
