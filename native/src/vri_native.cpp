// vri_native — host-side runtime kernels for the TPU renderer.
//
// The reference's ingest hot loops are native C++: Hydra's HdMeshUtil
// triangulation (used at Source/Mesh.cpp:52-79), the registry's pool
// memcpys (Source/ResourceRegistry.cpp:501-534), and the vendored (unused)
// meshoptimizer for vertex dedup/quantization.  This library provides the
// same capabilities for the TPU build's host path; Python binds it with
// ctypes (vri_tpu/runtime/native.py) and falls back to the numpy
// implementations when the .so is absent.
//
// Exported ABI: plain C, int64 sizes, caller-allocated outputs.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fan triangulation (HdMeshUtil::ComputeTriangleIndices equivalent).
// ---------------------------------------------------------------------------

// Number of triangles produced by fan-triangulating the given face counts.
int64_t vri_triangulate_count(const int32_t* counts, int64_t n_faces) {
    int64_t total = 0;
    for (int64_t f = 0; f < n_faces; ++f) {
        if (counts[f] > 2) total += counts[f] - 2;
    }
    return total;
}

// Fan-triangulate: writes (T,3) vertex ids, (T,) source face ids and (T,3)
// flat corner ids (for faceVarying primvar flattening). Returns T, or -1
// when the face counts are malformed (negative, or summing past the end of
// the index buffer) — a hostile/truncated stage must not read out of bounds
// here; the Python caller falls back to the checked numpy path on -1.
int64_t vri_triangulate(const int32_t* counts, int64_t n_faces,
                        const int32_t* indices, int64_t n_indices,
                        int32_t* out_tris, int32_t* out_face,
                        int32_t* out_corners) {
    int64_t t = 0;
    int64_t offset = 0;
    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t c = counts[f];
        if (c < 0 || offset + c > n_indices) return -1;
        for (int32_t k = 0; k + 2 < c; ++k) {
            out_tris[3 * t + 0] = indices[offset];
            out_tris[3 * t + 1] = indices[offset + k + 1];
            out_tris[3 * t + 2] = indices[offset + k + 2];
            out_corners[3 * t + 0] = (int32_t)offset;
            out_corners[3 * t + 1] = (int32_t)(offset + k + 1);
            out_corners[3 * t + 2] = (int32_t)(offset + k + 2);
            out_face[t] = (int32_t)f;
            ++t;
        }
        offset += c;
    }
    return t;
}

// ---------------------------------------------------------------------------
// Vertex dedup + quantization (meshoptimizer-style preprocessing; the
// reference vendors meshoptimizer but never calls it — RenderPass.cpp TODO
// at :1017-1018. Here it is a real pass.)
// ---------------------------------------------------------------------------

namespace {
struct Key3 {
    int64_t x, y, z;
    bool operator==(const Key3& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};
struct Key3Hash {
    size_t operator()(const Key3& k) const {
        uint64_t h = 1469598103934665603ull;
        auto mix = [&h](int64_t v) {
            h ^= (uint64_t)v;
            h *= 1099511628211ull;
        };
        mix(k.x); mix(k.y); mix(k.z);
        return (size_t)h;
    }
};
}  // namespace

// Weld vertices closer than `tolerance` (grid quantization). Writes the
// old->new index remap (n entries) and compacted positions (<= n*3 floats).
// Returns the deduplicated vertex count.
int64_t vri_dedup_vertices(const float* positions, int64_t n,
                           float tolerance, int32_t* out_remap,
                           float* out_positions) {
    const double inv = tolerance > 0 ? 1.0 / tolerance : 0.0;
    std::unordered_map<Key3, int32_t, Key3Hash> seen;
    seen.reserve((size_t)n * 2);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        Key3 k;
        if (tolerance > 0) {
            k = {(int64_t)std::llround(positions[3 * i + 0] * inv),
                 (int64_t)std::llround(positions[3 * i + 1] * inv),
                 (int64_t)std::llround(positions[3 * i + 2] * inv)};
        } else {  // exact-bits weld
            int32_t b[3];
            std::memcpy(b, positions + 3 * i, 12);
            k = {b[0], b[1], b[2]};
        }
        auto it = seen.find(k);
        if (it == seen.end()) {
            seen.emplace(k, (int32_t)m);
            out_positions[3 * m + 0] = positions[3 * i + 0];
            out_positions[3 * m + 1] = positions[3 * i + 1];
            out_positions[3 * m + 2] = positions[3 * i + 2];
            out_remap[i] = (int32_t)m;
            ++m;
        } else {
            out_remap[i] = it->second;
        }
    }
    return m;
}

// Quantize positions to a uint16 grid over their AABB (storage/cache
// compression). Writes (n,3) uint16 plus the 6-float AABB (lo,hi).
void vri_quantize_positions(const float* positions, int64_t n,
                            uint16_t* out_q, float* out_aabb) {
    float lo[3] = {INFINITY, INFINITY, INFINITY};
    float hi[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int64_t i = 0; i < n; ++i) {
        for (int k = 0; k < 3; ++k) {
            const float v = positions[3 * i + k];
            lo[k] = v < lo[k] ? v : lo[k];
            hi[k] = v > hi[k] ? v : hi[k];
        }
    }
    for (int k = 0; k < 3; ++k) {
        out_aabb[k] = lo[k];
        out_aabb[3 + k] = hi[k];
    }
    for (int64_t i = 0; i < n; ++i) {
        for (int k = 0; k < 3; ++k) {
            const float ext = hi[k] - lo[k];
            float t = ext > 0 ? (positions[3 * i + k] - lo[k]) / ext : 0.0f;
            int32_t q = (int32_t)std::lround(t * 65535.0f);
            q = q < 0 ? 0 : (q > 65535 ? 65535 : q);
            out_q[3 * i + k] = (uint16_t)q;
        }
    }
}

void vri_dequantize_positions(const uint16_t* q, int64_t n,
                              const float* aabb, float* out_positions) {
    for (int64_t i = 0; i < n; ++i) {
        for (int k = 0; k < 3; ++k) {
            const float ext = aabb[3 + k] - aabb[k];
            out_positions[3 * i + k] =
                aabb[k] + (q[3 * i + k] / 65535.0f) * ext;
        }
    }
}

// ---------------------------------------------------------------------------
// 30-bit Morton codes over unit-cube points (host-side BVH/cache ordering).
// ---------------------------------------------------------------------------

static inline uint32_t expand10(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

void vri_morton3d(const float* points01, int64_t n, uint32_t* out_codes) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t q[3];
        for (int k = 0; k < 3; ++k) {
            float v = points01[3 * i + k] * 1024.0f;
            v = v < 0 ? 0 : (v > 1023.0f ? 1023.0f : v);
            q[k] = (uint32_t)v;
        }
        out_codes[i] = (expand10(q[0]) << 2) | (expand10(q[1]) << 1)
                       | expand10(q[2]);
    }
}

// ---------------------------------------------------------------------------
// Host arena for scene-cache assembly (the VMA-stats analog: the TPU side
// is XLA-managed, but the host pack path wants one big reusable buffer —
// reference host pools: Source/ResourceRegistry.cpp:88-89,501-534).
// ---------------------------------------------------------------------------

namespace {
struct Arena {
    std::vector<uint8_t> buf;
    int64_t used = 0;
    int64_t peak = 0;
};
Arena g_arena;
}  // namespace

// Returns an *offset* into the arena (resolve with vri_arena_base()), not a
// pointer: the backing vector may reallocate on growth, which would dangle
// any previously returned pointer.  Offsets stay valid across growth.
int64_t vri_arena_alloc(int64_t bytes) {
    int64_t aligned = (bytes + 63) & ~int64_t(63);
    if (g_arena.used + aligned > (int64_t)g_arena.buf.size()) {
        g_arena.buf.resize(g_arena.used + aligned);
    }
    int64_t off = g_arena.used;
    g_arena.used += aligned;
    if (g_arena.used > g_arena.peak) g_arena.peak = g_arena.used;
    return off;
}

// Current base address of the arena. Only valid until the next
// vri_arena_alloc that grows the buffer; re-query after every alloc batch.
void* vri_arena_base() { return g_arena.buf.data(); }

void vri_arena_reset() { g_arena.used = 0; }

void vri_arena_stats(int64_t* used, int64_t* peak, int64_t* reserved) {
    *used = g_arena.used;
    *peak = g_arena.peak;
    *reserved = (int64_t)g_arena.buf.size();
}

int32_t vri_abi_version() { return 3; }

}  // extern "C"
