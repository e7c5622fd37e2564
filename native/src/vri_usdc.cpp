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
#include <algorithm>
#include <limits>
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
// LZ4 block compress (greedy hash-chain-free matcher, public block format).
// Correctness-first: any output decodable by vri_lz4_decompress_block (and
// by reference LZ4) is valid; ratio is within ~10% of lz4 -1 on crate data.
// Returns compressed size or -1 if dst_cap too small.
// ---------------------------------------------------------------------------
long vri_lz4_compress_block(const unsigned char* src, long src_len,
                            unsigned char* dst, long dst_cap) {
  if (src_len < 0) return -1;
  unsigned char* op = dst;
  unsigned char* const oend = dst + dst_cap;
  long anchor = 0;  // start of pending literals
  // last 5 bytes must be literals; matches must end 12 bytes before end
  const long mflimit = src_len - 12;
  static const long kHashSize = 1 << 16;
  std::vector<long> table(kHashSize, -1);

  auto hash4 = [&](long i) -> unsigned {
    unsigned v;
    std::memcpy(&v, src + i, 4);
    return (v * 2654435761u) >> 16;
  };
  auto emit = [&](long lit_from, long lit_n, long mlen, long moff) -> int {
    long need = 1 + lit_n / 255 + 1 + lit_n + 2 + (mlen >= 19 ? (mlen - 19) / 255 + 1 : 0) + 8;
    if (op + need > oend) return -1;
    unsigned char* tok = op++;
    long l = lit_n;
    *tok = (l >= 15 ? 15 : (unsigned char)l) << 4;
    if (l >= 15) {
      l -= 15;
      while (l >= 255) { *op++ = 255; l -= 255; }
      *op++ = (unsigned char)l;
    }
    std::memcpy(op, src + lit_from, (size_t)lit_n);
    op += lit_n;
    if (mlen > 0) {
      *op++ = (unsigned char)(moff & 0xFF);
      *op++ = (unsigned char)(moff >> 8);
      long m = mlen - 4;
      *tok |= (m >= 15 ? 15 : (unsigned char)m);
      if (m >= 15) {
        m -= 15;
        while (m >= 255) { *op++ = 255; m -= 255; }
        *op++ = (unsigned char)m;
      }
    }
    return 0;
  };

  long i = 0;
  while (i <= mflimit && mflimit >= 0) {
    unsigned h = hash4(i);
    long cand = table[h];
    table[h] = i;
    unsigned a, b;
    if (cand >= 0 && i - cand <= 0xFFFF &&
        (std::memcpy(&a, src + cand, 4), std::memcpy(&b, src + i, 4),
         a == b)) {
      long mlen = 4;
      while (i + mlen < src_len - 5 && src[cand + mlen] == src[i + mlen])
        ++mlen;
      if (emit(anchor, i - anchor, mlen, i - cand) != 0) return -1;
      i += mlen;
      anchor = i;
    } else {
      ++i;
    }
  }
  // trailing literals
  if (emit(anchor, src_len - anchor, 0, 0) != 0) return -1;
  return (long)(op - dst);
}

// ---------------------------------------------------------------------------
// TfFastCompression framing (pxr/base/tf/fastCompression.cpp behavior):
// byte 0 == 0 -> the rest is ONE LZ4 block; byte 0 == n > 0 -> n chunks,
// each prefixed by an int32 compressed size.  Crate-scale payloads are
// single-chunk (multi-chunk starts beyond LZ4_MAX_INPUT_SIZE ~ 2 GB).
// ---------------------------------------------------------------------------
long vri_fastcomp_decompress(const unsigned char* src, long src_len,
                             unsigned char* dst, long dst_cap) {
  if (src_len < 1) return -1;
  unsigned nchunks = src[0];
  if (nchunks == 0)
    return vri_lz4_decompress_block(src + 1, src_len - 1, dst, dst_cap);
  if (nchunks == 1) {
    // tolerate both single-chunk framings seen in the wild: with an int32
    // size prefix and without
    if (src_len >= 5) {
      int csz;
      std::memcpy(&csz, src + 1, 4);
      if (csz > 0 && 5 + csz <= src_len) {
        long got = vri_lz4_decompress_block(src + 5, csz, dst, dst_cap);
        if (got >= 0) return got;
      }
    }
    return vri_lz4_decompress_block(src + 1, src_len - 1, dst, dst_cap);
  }
  const unsigned char* ip = src + 1;
  const unsigned char* iend = src + src_len;
  unsigned char* op = dst;
  for (unsigned c = 0; c < nchunks; ++c) {
    if (ip + 4 > iend) return -1;
    int csz;
    std::memcpy(&csz, ip, 4);
    ip += 4;
    if (csz < 0 || ip + csz > iend) return -1;
    long got = vri_lz4_decompress_block(ip, csz, op, dst_cap - (op - dst));
    if (got < 0) return -1;
    ip += csz;
    op += got;
  }
  return (long)(op - dst);
}

long vri_fastcomp_compress(const unsigned char* src, long src_len,
                           unsigned char* dst, long dst_cap) {
  if (dst_cap < 1) return -1;
  dst[0] = 0;
  long got = vri_lz4_compress_block(src, src_len, dst + 1, dst_cap - 1);
  return got < 0 ? -1 : got + 1;
}

// ---------------------------------------------------------------------------
// Usd_IntegerCompression (pxr/usd/usd/integerCoding.cpp scheme): ints are
// delta-coded (v[-1] = 0); the encoded stream is
//   [common delta: IntN LE] [2-bit codes, LSB-first, (n*2+7)/8 bytes]
//   [per-int residuals in code order]
// with codes 0=common, and residual widths 8/16/32 (32-bit variant) or
// 16/32/64 (64-bit variant); the whole stream is TfFastCompression-framed
// LZ4.  Decoders return 0 on success.
// ---------------------------------------------------------------------------
}  // extern "C" (templates need C++ linkage)

static long enc_workspace_size(long n, int intsz) {
  return intsz + (n * 2 + 7) / 8 + n * intsz + 16;
}

template <typename Int, typename S8, typename S16, typename S32>
static int intcomp_decode_impl(const unsigned char* comp, long comp_len,
                               long n, Int* out) {
  long wcap = enc_workspace_size(n, (int)sizeof(Int));
  std::vector<unsigned char> ws(wcap);
  long usize = vri_fastcomp_decompress(comp, comp_len, ws.data(), wcap);
  if (usize < 0) return -1;
  const unsigned char* p = ws.data();
  const unsigned char* pend = ws.data() + usize;
  Int common;
  if (p + sizeof(Int) > pend) return -1;
  std::memcpy(&common, p, sizeof(Int));
  p += sizeof(Int);
  long ncode = (n * 2 + 7) / 8;
  if (p + ncode > pend) return -1;
  const unsigned char* codes = p;
  p += ncode;
  Int prev = 0;
  for (long i = 0; i < n; ++i) {
    unsigned code = (codes[i >> 2] >> ((i & 3) * 2)) & 3;
    Int delta = 0;
    if (code == 0) {
      delta = common;
    } else if (code == 1) {
      S8 v;
      if (p + sizeof(S8) > pend) return -1;
      std::memcpy(&v, p, sizeof(S8));
      p += sizeof(S8);
      delta = (Int)v;
    } else if (code == 2) {
      S16 v;
      if (p + sizeof(S16) > pend) return -1;
      std::memcpy(&v, p, sizeof(S16));
      p += sizeof(S16);
      delta = (Int)v;
    } else {
      S32 v;
      if (p + sizeof(S32) > pend) return -1;
      std::memcpy(&v, p, sizeof(S32));
      p += sizeof(S32);
      delta = (Int)v;
    }
    prev += delta;
    out[i] = prev;
  }
  return 0;
}

template <typename Int, typename S8, typename S16, typename S32>
static long intcomp_encode_impl(const Int* in, long n, unsigned char* out,
                                long out_cap) {
  // deltas + most-common delta (exact, via sort of a copy)
  std::vector<Int> deltas(n);
  Int prev = 0;
  for (long i = 0; i < n; ++i) {
    deltas[i] = in[i] - prev;
    prev = in[i];
  }
  Int common = 0;
  {
    std::vector<Int> s(deltas);
    std::sort(s.begin(), s.end());
    long best = 0, run = 0;
    for (long i = 0; i < n; ++i) {
      run = (i > 0 && s[i] == s[i - 1]) ? run + 1 : 1;
      if (run > best) { best = run; common = s[i]; }
    }
  }
  long wcap = enc_workspace_size(n, (int)sizeof(Int));
  std::vector<unsigned char> ws(wcap, 0);
  unsigned char* p = ws.data();
  std::memcpy(p, &common, sizeof(Int));
  p += sizeof(Int);
  unsigned char* codes = p;
  long ncode = (n * 2 + 7) / 8;
  p += ncode;
  for (long i = 0; i < n; ++i) {
    Int d = deltas[i];
    unsigned code;
    if (d == common) {
      code = 0;
    } else if (d >= (Int)std::numeric_limits<S8>::min() &&
               d <= (Int)std::numeric_limits<S8>::max()) {
      code = 1;
      S8 v = (S8)d;
      std::memcpy(p, &v, sizeof(S8));
      p += sizeof(S8);
    } else if (d >= (Int)std::numeric_limits<S16>::min() &&
               d <= (Int)std::numeric_limits<S16>::max()) {
      code = 2;
      S16 v = (S16)d;
      std::memcpy(p, &v, sizeof(S16));
      p += sizeof(S16);
    } else {
      code = 3;
      S32 v = (S32)d;
      std::memcpy(p, &v, sizeof(S32));
      p += sizeof(S32);
    }
    codes[i >> 2] |= code << ((i & 3) * 2);
  }
  return vri_fastcomp_compress(ws.data(), (long)(p - ws.data()), out,
                               out_cap);
}

extern "C" {

int vri_intcomp_decode32(const unsigned char* comp, long comp_len, long n,
                         int* out) {
  return intcomp_decode_impl<int, signed char, short, int>(comp, comp_len,
                                                           n, out);
}

int vri_intcomp_decode64(const unsigned char* comp, long comp_len, long n,
                         long long* out) {
  return intcomp_decode_impl<long long, short, int, long long>(
      comp, comp_len, n, out);
}

long vri_intcomp_encode32(const int* in, long n, unsigned char* out,
                          long out_cap) {
  return intcomp_encode_impl<int, signed char, short, int>(in, n, out,
                                                           out_cap);
}

long vri_intcomp_encode64(const long long* in, long n, unsigned char* out,
                          long out_cap) {
  return intcomp_encode_impl<long long, short, int, long long>(in, n, out,
                                                               out_cap);
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
