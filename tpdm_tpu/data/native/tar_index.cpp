// Native tar-shard indexer for the WebDataset fast path.
//
// The reference streams COYO/LAION-scale .tar shards through HF
// webdataset (src/data/hf_dataset.py:15-31, pure Python). Here the shard
// member table (name, payload offset, size) is built natively in one
// sequential pass over the 512-byte headers, so Python can pread just the
// .json members it needs instead of driving tarfile's per-member object
// machinery. Handles USTAR, GNU longname ('L') and skips PAX ('x'/'g')
// extended headers (falling back to the short name the next header
// carries).
//
// Exposed C ABI (ctypes in __init__.py):
//   tpdm_tar_index(path, &buf, &len) -> n_entries (-1 on error)
//     buf: malloc'd lines "offset\tsize\tname\n" (caller frees: tpdm_free)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

constexpr size_t kBlock = 512;

long parse_octal(const char* p, size_t n) {
  long v = 0;
  size_t i = 0;
  while (i < n && (p[i] == ' ' || p[i] == '\0')) i++;
  for (; i < n && p[i] >= '0' && p[i] <= '7'; i++) v = v * 8 + (p[i] - '0');
  return v;
}

bool is_zero_block(const char* b) {
  for (size_t i = 0; i < kBlock; i++)
    if (b[i] != 0) return false;
  return true;
}

}  // namespace

extern "C" {

void tpdm_free(char* p);  // defined in jsonl_loader.cpp when linked together

long tpdm_tar_index(const char* path, char** out, long* out_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string result;
  std::string longname;
  char hdr[kBlock];
  long n_entries = 0;
  long offset = 0;
  int zero_blocks = 0;
  while (std::fread(hdr, 1, kBlock, f) == kBlock) {
    offset += kBlock;
    if (is_zero_block(hdr)) {
      if (++zero_blocks >= 2) break;  // end-of-archive marker
      continue;
    }
    zero_blocks = 0;
    long size = parse_octal(hdr + 124, 12);
    long padded = (size + kBlock - 1) / kBlock * kBlock;
    char type = hdr[156];
    if (type == 'L') {  // GNU longname: payload is the next entry's name
      if (size > 0 && size < 1 << 20) {
        std::string name(static_cast<size_t>(size), '\0');
        if (std::fread(&name[0], 1, size, f) != static_cast<size_t>(size)) break;
        while (!name.empty() && name.back() == '\0') name.pop_back();
        longname = name;
        if (std::fseek(f, padded - size, SEEK_CUR) != 0) break;
      } else if (std::fseek(f, padded, SEEK_CUR) != 0) {
        break;
      }
      offset += padded;
      continue;
    }
    std::string name;
    if (!longname.empty()) {
      name.swap(longname);
    } else {
      char prefix[156] = {0};
      std::memcpy(prefix, hdr + 345, 155);  // USTAR prefix field
      char short_name[101] = {0};
      std::memcpy(short_name, hdr, 100);
      if (std::memcmp(hdr + 257, "ustar", 5) == 0 && prefix[0]) {
        name = std::string(prefix) + "/" + short_name;
      } else {
        name = short_name;
      }
    }
    // '0' / '\0' = regular file; skip dirs, links, PAX 'x'/'g', etc.
    if (type == '0' || type == '\0') {
      result += std::to_string(offset);
      result += '\t';
      result += std::to_string(size);
      result += '\t';
      result += name;
      result += '\n';
      n_entries++;
    }
    if (std::fseek(f, padded, SEEK_CUR) != 0) break;
    offset += padded;
  }
  std::fclose(f);
  char* buf = static_cast<char*>(std::malloc(result.size() + 1));
  if (!buf) return -1;
  std::memcpy(buf, result.data(), result.size());
  buf[result.size()] = '\0';
  *out = buf;
  *out_len = static_cast<long>(result.size());
  return n_entries;
}

}  // extern "C"
