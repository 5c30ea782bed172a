// Fast JSONL field extraction for the prompt data loader.
//
// The reference funnels prompt corpora through HF `datasets`
// (reference: src/data/hf_dataset.py:34-65) whose JSON path is
// Rust/pyarrow-backed; this is the tpdm_tpu native equivalent: mmap-free
// single-pass scan that pulls one string field per JSONL line with full
// JSON string unescaping. Exposed over a C ABI consumed via ctypes
// (tpdm_tpu/data/native.py). Returns every value NUL-separated in one
// buffer to keep the FFI to a single crossing.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Decode a JSON string starting at s (after the opening quote) into out.
// Returns position after the closing quote, or npos on error.
size_t decode_json_string(const std::string& buf, size_t s, std::string* out) {
  while (s < buf.size()) {
    char c = buf[s];
    if (c == '"') return s + 1;
    if (c == '\\') {
      if (s + 1 >= buf.size()) return std::string::npos;
      char e = buf[s + 1];
      switch (e) {
        case '"': out->push_back('"'); break;
        case '\\': out->push_back('\\'); break;
        case '/': out->push_back('/'); break;
        case 'b': out->push_back('\b'); break;
        case 'f': out->push_back('\f'); break;
        case 'n': out->push_back('\n'); break;
        case 'r': out->push_back('\r'); break;
        case 't': out->push_back('\t'); break;
        case 'u': {
          if (s + 5 >= buf.size()) return std::string::npos;
          unsigned int cp = 0;
          if (sscanf(buf.c_str() + s + 2, "%4x", &cp) != 1)
            return std::string::npos;
          s += 4;
          // UTF-8 encode (surrogate pairs handled as two \u escapes by
          // emitting each half; fine for BMP prompts, rare otherwise)
          if (cp < 0x80) {
            out->push_back(static_cast<char>(cp));
          } else if (cp < 0x800) {
            out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
            out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
          } else {
            out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
            out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
          }
          break;
        }
        default:
          return std::string::npos;
      }
      s += 2;
      continue;
    }
    out->push_back(c);
    ++s;
  }
  return std::string::npos;
}

// Extract `"key"\s*:\s*"..."` from one JSON object line.
bool extract_field(const std::string& line, const std::string& quoted_key,
                   std::string* out) {
  size_t pos = 0;
  while ((pos = line.find(quoted_key, pos)) != std::string::npos) {
    size_t p = pos + quoted_key.size();
    while (p < line.size() && (line[p] == ' ' || line[p] == '\t')) ++p;
    if (p >= line.size() || line[p] != ':') {
      pos = p;
      continue;
    }
    ++p;
    while (p < line.size() && (line[p] == ' ' || line[p] == '\t')) ++p;
    if (p >= line.size() || line[p] != '"') return false;  // non-string value
    out->clear();
    return decode_json_string(line, p + 1, out) != std::string::npos;
  }
  return false;
}

}  // namespace

extern "C" {

// Scan a JSONL file, extracting string field `key` from each line.
// On success: returns the number of values, *out points to a malloc'd
// buffer of NUL-separated strings of total size *out_len. On failure
// returns -1. Lines without the key are skipped.
long tpdm_read_jsonl_field(const char* path, const char* key, char** out,
                           long* out_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string buf;
  {
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size < 0) {
      std::fclose(f);
      return -1;
    }
    buf.resize(static_cast<size_t>(size));
    if (size > 0 && std::fread(&buf[0], 1, size, f) != (size_t)size) {
      std::fclose(f);
      return -1;
    }
  }
  std::fclose(f);

  std::string quoted_key = std::string("\"") + key + "\"";
  std::string packed;
  packed.reserve(buf.size() / 4);
  long count = 0;
  std::string value;

  size_t start = 0;
  while (start < buf.size()) {
    size_t end = buf.find('\n', start);
    if (end == std::string::npos) end = buf.size();
    if (end > start) {
      std::string line = buf.substr(start, end - start);
      if (extract_field(line, quoted_key, &value)) {
        packed.append(value);
        packed.push_back('\0');
        ++count;
      }
    }
    start = end + 1;
  }

  char* mem = static_cast<char*>(std::malloc(packed.size()));
  if (!mem && !packed.empty()) return -1;
  std::memcpy(mem, packed.data(), packed.size());
  *out = mem;
  *out_len = static_cast<long>(packed.size());
  return count;
}

void tpdm_free(char* p) { std::free(p); }

}  // extern "C"
