// usdc ("crate") binary stage file reader — structural tier.
//
// The reference links full OpenUSD, whose Sdf_CrateFile
// (pxr/usd/sdf/crateFile.cpp) reads the binary crate format Kitchen-Set-
// class stages ship as.  This native module is the crate *front end* for
// the USD-lite stack: bootstrap + table-of-contents + the TOKENS section
// (the string heap every other section indexes into).  Layout handled
// here is the stable, documented part of the format:
//
//   bootstrap (88 B): ident "PXR-USDC" | u8 version[8] | u64 tocOffset
//                     | u64 reserved[8]
//   TOC @tocOffset:   u64 count; count x { char name[16]; u64 start;
//                     u64 size }
//   TOKENS (<=0.3.x): u64 numTokens; null-separated strings
//   TOKENS (>=0.4.0): u64 numTokens; u64 uncompressedSize;
//                     u64 compressedSize; lz4-framed blob (TfFastCompression:
//                     a leading chunk-count byte when the buffer exceeds one
//                     LZ4 block, else one raw LZ4 block)
//
// The FIELDS/FIELDSETS/PATHS/SPECS sections use pxr's custom integer
// compression; those decoders are the next milestone — until then the
// Python side surfaces a structured "sections present but unsupported"
// error instead of a parse failure (vri_tpu/usd/usdc.py).
//
// LZ4 block decompression is implemented here from the public block spec
// (token byte | literals | little-endian match offset | match copy with
// overlap) — no external lz4 dependency in this image.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// LZ4 block decode (public block format). Returns decompressed size or -1.
// ---------------------------------------------------------------------------
long vri_lz4_decompress_block(const unsigned char* src, long src_len,
                              unsigned char* dst, long dst_cap) {
  const unsigned char* ip = src;
  const unsigned char* const iend = src + src_len;
  unsigned char* op = dst;
  unsigned char* const oend = dst + dst_cap;

  while (ip < iend) {
    unsigned token = *ip++;
    // literals
    long lit = token >> 4;
    if (lit == 15) {
      unsigned char b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit += b;
      } while (b == 255);
    }
    if (ip + lit > iend || op + lit > oend) return -1;
    std::memcpy(op, ip, (size_t)lit);
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // last sequence has no match
    // match
    if (ip + 2 > iend) return -1;
    long offset = ip[0] | (ip[1] << 8);
    ip += 2;
    if (offset == 0 || op - dst < offset) return -1;
    long mlen = token & 15;
    if (mlen == 15) {
      unsigned char b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (op + mlen > oend) return -1;
    const unsigned char* match = op - offset;
    for (long i = 0; i < mlen; ++i) op[i] = match[i];  // overlap-safe
    op += mlen;
  }
  return (long)(op - dst);
}

// ---------------------------------------------------------------------------
// Crate structural reader
// ---------------------------------------------------------------------------

struct VriCrateSection {
  char name[16];
  unsigned long long start;
  unsigned long long size;
};

struct VriCrateInfo {
  unsigned char version[3];  // major, minor, patch
  long long n_sections;      // -1 on error
  VriCrateSection sections[64];
  char error[128];
};

static int read_at(FILE* f, unsigned long long off, void* buf, size_t n) {
  if (fseek(f, (long)off, SEEK_SET) != 0) return -1;
  return fread(buf, 1, n, f) == n ? 0 : -1;
}

// Parse bootstrap + TOC. Returns 0 on success, -1 otherwise (info->error).
int vri_usdc_info(const char* path, VriCrateInfo* info) {
  std::memset(info, 0, sizeof(*info));
  info->n_sections = -1;
  FILE* f = fopen(path, "rb");
  if (!f) {
    std::snprintf(info->error, sizeof(info->error), "cannot open file");
    return -1;
  }
  unsigned char boot[88];
  if (read_at(f, 0, boot, sizeof(boot)) != 0) {
    std::snprintf(info->error, sizeof(info->error), "short bootstrap");
    fclose(f);
    return -1;
  }
  if (std::memcmp(boot, "PXR-USDC", 8) != 0) {
    std::snprintf(info->error, sizeof(info->error), "not a usdc file");
    fclose(f);
    return -1;
  }
  info->version[0] = boot[8];
  info->version[1] = boot[9];
  info->version[2] = boot[10];
  unsigned long long toc_off;
  std::memcpy(&toc_off, boot + 16, 8);
  unsigned long long count;
  if (read_at(f, toc_off, &count, 8) != 0 || count > 64) {
    std::snprintf(info->error, sizeof(info->error), "bad TOC (count=%llu)",
                  count);
    fclose(f);
    return -1;
  }
  for (unsigned long long i = 0; i < count; ++i) {
    unsigned char rec[32];
    if (read_at(f, toc_off + 8 + i * 32, rec, 32) != 0) {
      std::snprintf(info->error, sizeof(info->error), "short TOC entry");
      fclose(f);
      return -1;
    }
    std::memcpy(info->sections[i].name, rec, 16);
    info->sections[i].name[15] = 0;
    std::memcpy(&info->sections[i].start, rec + 16, 8);
    std::memcpy(&info->sections[i].size, rec + 24, 8);
  }
  info->n_sections = (long long)count;
  fclose(f);
  return 0;
}

// Read the TOKENS section into `out` as null-separated strings.
// Returns the number of tokens, or -1 on error / unsupported layout.
long long vri_usdc_tokens(const char* path, unsigned long long start,
                          unsigned long long size, int version_minor,
                          unsigned char* out, long long out_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned long long num_tokens;
  if (read_at(f, start, &num_tokens, 8) != 0) {
    fclose(f);
    return -1;
  }
  if (version_minor < 4) {
    // uncompressed: the remainder of the section is the string heap
    unsigned long long blob = size - 8;
    if ((long long)blob > out_cap) {
      fclose(f);
      return -1;
    }
    if (read_at(f, start + 8, out, blob) != 0) {
      fclose(f);
      return -1;
    }
    fclose(f);
    return (long long)num_tokens;
  }
  // >= 0.4.0: u64 uncompressedSize, u64 compressedSize, lz4 blob
  unsigned long long usize, csize;
  if (read_at(f, start + 8, &usize, 8) != 0 ||
      read_at(f, start + 16, &csize, 8) != 0 || (long long)usize > out_cap) {
    fclose(f);
    return -1;
  }
  std::vector<unsigned char> comp(csize);
  if (read_at(f, start + 24, comp.data(), csize) != 0) {
    fclose(f);
    return -1;
  }
  fclose(f);
  // TfFastCompression framing: single-chunk buffers are one raw LZ4
  // block preceded by a chunk-count byte of 0 or 1; multi-chunk (>127MB)
  // is out of scope here.
  const unsigned char* src = comp.data();
  long src_len = (long)csize;
  if (src_len > 0 && (src[0] == 0 || src[0] == 1)) {
    long got = vri_lz4_decompress_block(src + 1, src_len - 1, out,
                                        (long)usize);
    if (got == (long)usize) return (long long)num_tokens;
  }
  long got = vri_lz4_decompress_block(src, src_len, out, (long)usize);
  if (got == (long)usize) return (long long)num_tokens;
  return -1;
}

}  // extern "C"
