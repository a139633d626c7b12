// Kaldi ark/scp binary parsing core.
//
// Native replacement for the I/O work the reference delegates to external
// Kaldi C++ binaries and the kaldi-io-for-python glue (SURVEY.md §2c):
// header-only frame counting (feat-to-len), matrix reads at scp offsets, and
// bulk archive scans feeding the Python loader through ctypes without
// per-matrix Python overhead.
//
// Exposed as a C ABI (libpka_native.so) consumed by
// pytorch_kaldi_asr_tpu/native/__init__.py; CLI entry points live in
// tools_main.cc.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  explicit Reader(FILE* file) : f(file) {}
  bool read_exact(void* dst, size_t n) { return fread(dst, 1, n, f) == n; }
  int getc_() { return fgetc(f); }
};

// Read "\0B" binary marker. Returns false on EOF/mismatch.
bool expect_binary(Reader& r) {
  int a = r.getc_();
  int b = r.getc_();
  return a == 0 && b == 'B';
}

// Read a space-terminated token like "FM ", "CM2 ".
bool read_token(Reader& r, std::string* tok) {
  tok->clear();
  int c;
  while ((c = r.getc_()) != EOF) {
    if (c == ' ') return !tok->empty();
    tok->push_back(static_cast<char>(c));
    if (tok->size() > 8) return false;
  }
  return false;
}

bool read_int32(Reader& r, int32_t* out) {
  int size = r.getc_();
  if (size != 4) return false;
  return r.read_exact(out, 4);
}

// Parse matrix header after the \0B marker; leaves the stream at the data.
// Returns 0 on success. kind: 0=FM,1=DM,2=CM,3=CM2,4=CM3.
int parse_header(Reader& r, int* kind, int32_t* rows, int32_t* cols,
                 float* min_value, float* range) {
  std::string tok;
  if (!read_token(r, &tok)) return -1;
  if (tok == "FM" || tok == "DM") {
    *kind = (tok == "FM") ? 0 : 1;
    if (!read_int32(r, rows) || !read_int32(r, cols)) return -1;
    return 0;
  }
  if (tok == "CM" || tok == "CM2" || tok == "CM3") {
    *kind = (tok == "CM") ? 2 : (tok == "CM2" ? 3 : 4);
    if (!r.read_exact(min_value, 4) || !r.read_exact(range, 4)) return -1;
    if (!r.read_exact(rows, 4) || !r.read_exact(cols, 4)) return -1;
    return 0;
  }
  return -1;
}

float cm_u16_to_float(uint16_t v, float min_value, float range) {
  return min_value + range * (static_cast<float>(v) / 65535.0f);
}

// Decode the matrix data (stream positioned after header) into out
// (rows*cols floats). Returns 0 on success.
int decode_data(Reader& r, int kind, int32_t rows, int32_t cols,
                float min_value, float range, float* out) {
  const size_t n = static_cast<size_t>(rows) * cols;
  if (kind == 0) {
    return r.read_exact(out, n * 4) ? 0 : -1;
  }
  if (kind == 1) {
    std::vector<double> tmp(n);
    if (!r.read_exact(tmp.data(), n * 8)) return -1;
    for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(tmp[i]);
    return 0;
  }
  if (kind == 2) {  // CM: per-column headers + uint8 codes, column-major
    std::vector<uint16_t> headers(4 * cols);
    if (!r.read_exact(headers.data(), headers.size() * 2)) return -1;
    std::vector<uint8_t> codes(n);
    if (!r.read_exact(codes.data(), n)) return -1;
    for (int32_t c = 0; c < cols; ++c) {
      float p0 = cm_u16_to_float(headers[4 * c + 0], min_value, range);
      float p25 = cm_u16_to_float(headers[4 * c + 1], min_value, range);
      float p75 = cm_u16_to_float(headers[4 * c + 2], min_value, range);
      float p100 = cm_u16_to_float(headers[4 * c + 3], min_value, range);
      const uint8_t* col = codes.data() + static_cast<size_t>(c) * rows;
      for (int32_t i = 0; i < rows; ++i) {
        float v;
        uint8_t code = col[i];
        if (code <= 64) {
          v = p0 + (p25 - p0) * (code / 64.0f);
        } else if (code <= 192) {
          v = p25 + (p75 - p25) * ((code - 64) / 128.0f);
        } else {
          v = p75 + (p100 - p75) * ((code - 192) / 63.0f);
        }
        out[static_cast<size_t>(i) * cols + c] = v;
      }
    }
    return 0;
  }
  if (kind == 3) {  // CM2: uint16 row-major
    std::vector<uint16_t> codes(n);
    if (!r.read_exact(codes.data(), n * 2)) return -1;
    for (size_t i = 0; i < n; ++i)
      out[i] = min_value + range * (codes[i] / 65535.0f);
    return 0;
  }
  if (kind == 4) {  // CM3: uint8 row-major
    std::vector<uint8_t> codes(n);
    if (!r.read_exact(codes.data(), n)) return -1;
    for (size_t i = 0; i < n; ++i)
      out[i] = min_value + range * (codes[i] / 255.0f);
    return 0;
  }
  return -1;
}

}  // namespace

extern "C" {

// Matrix shape at an explicit file offset (scp rxfilename "path:offset").
// Returns 0 and fills rows/cols; header-only (no data decode).
int pka_mat_shape(const char* path, long offset, int32_t* rows,
                  int32_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (offset > 0 && fseek(f, offset, SEEK_SET) != 0) {
    fclose(f);
    return -1;
  }
  Reader r(f);
  int kind;
  float mn, rg;
  int rc = -1;
  if (expect_binary(r)) rc = parse_header(r, &kind, rows, cols, &mn, &rg);
  fclose(f);
  return rc;
}

// Read one matrix at an offset into caller buffer (rows*cols floats,
// query shape first with pka_mat_shape).
int pka_read_mat(const char* path, long offset, float* out, int32_t max_rows,
                 int32_t max_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (offset > 0 && fseek(f, offset, SEEK_SET) != 0) {
    fclose(f);
    return -1;
  }
  Reader r(f);
  int kind;
  int32_t rows, cols;
  float mn = 0, rg = 0;
  int rc = -1;
  if (expect_binary(r) &&
      parse_header(r, &kind, &rows, &cols, &mn, &rg) == 0 &&
      rows <= max_rows && cols <= max_cols) {
    rc = decode_data(r, kind, rows, cols, mn, rg, out);
  }
  fclose(f);
  return rc;
}

// Scan a whole archive: write keys (newline-joined, caller buffer) and
// rows/cols arrays. Returns number of matrices, or -1.
int pka_scan_ark(const char* path, char* keys_buf, long keys_buf_size,
                 int32_t* rows_out, int32_t* cols_out, int32_t max_entries) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Reader r(f);
  long keys_pos = 0;
  int count = 0;
  while (count < max_entries) {
    // read whitespace-delimited key
    std::string key;
    int c;
    while ((c = r.getc_()) != EOF &&
           (c == ' ' || c == '\n' || c == '\t')) {
    }
    if (c == EOF) break;
    key.push_back(static_cast<char>(c));
    while ((c = r.getc_()) != EOF && c != ' ' && c != '\n' && c != '\t')
      key.push_back(static_cast<char>(c));
    if (!expect_binary(r)) {
      fclose(f);
      return -1;
    }
    int kind;
    int32_t rows, cols;
    float mn = 0, rg = 0;
    if (parse_header(r, &kind, &rows, &cols, &mn, &rg) != 0) {
      fclose(f);
      return -1;
    }
    // skip the data
    long skip;
    switch (kind) {
      case 0: skip = static_cast<long>(rows) * cols * 4; break;
      case 1: skip = static_cast<long>(rows) * cols * 8; break;
      case 2: skip = 8L * cols + static_cast<long>(rows) * cols; break;
      case 3: skip = static_cast<long>(rows) * cols * 2; break;
      default: skip = static_cast<long>(rows) * cols; break;
    }
    if (fseek(f, skip, SEEK_CUR) != 0) {
      fclose(f);
      return -1;
    }
    if (keys_pos + static_cast<long>(key.size()) + 1 >= keys_buf_size) {
      fclose(f);
      return -1;
    }
    memcpy(keys_buf + keys_pos, key.data(), key.size());
    keys_pos += key.size();
    keys_buf[keys_pos++] = '\n';
    rows_out[count] = rows;
    cols_out[count] = cols;
    ++count;
  }
  if (keys_pos < keys_buf_size) keys_buf[keys_pos] = '\0';
  fclose(f);
  return count;
}

}  // extern "C"
