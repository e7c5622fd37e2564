// vri_lod — quadric-error-metric mesh simplification for the LOD system.
//
// TPU-native counterpart of the cluster-LOD preprocessing a
// production renderer needs at scale (the reference renders full-rate
// geometry only — its visibility pass walks every draw item,
// Source/RenderPass.cpp:642-664 — which is exactly why sub-pixel triangle
// storms bound its scalability too).  This simplifier feeds the registry's
// LOD chains: discrete decimated levels selected per instance, per frame,
// by screen-space error (vri_tpu/ops/lod.py).
//
// Design: Garland–Heckbert quadric edge collapse with SUBSET placement
// (a collapse moves v onto the surviving endpoint u, never to a derived
// position).  Subset placement is deliberate: surviving vertices keep
// their original positions, so every LOD level's triangles reference a
// SUBSET of the original vertex pool — the packed scene grows only in
// the face pool, world-space baking is unchanged, and per-corner UVs
// carry over exactly through surviving-triangle ids.
//
// Error reporting: alongside the quadric ordering cost, the simplifier
// tracks a conservative geometric displacement bound — on collapse
// v -> u, D(u) = max(D(u), D(v) + |pos_v - pos_u|) — and returns the
// maximum over all vertices.  The renderer converts this object-space
// bound to screen pixels for LOD selection, so the image error of a
// selected level is bounded by construction.
//
// Exported ABI: plain C, int64 sizes, caller-allocated outputs.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct Quadric {
    // symmetric 4x4: a2 ab ac ad b2 bc bd c2 cd d2
    double q[10];
    void zero() { std::memset(q, 0, sizeof(q)); }
    void add_plane(double a, double b, double c, double d, double w) {
        q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c;
        q[3] += w * a * d; q[4] += w * b * b; q[5] += w * b * c;
        q[6] += w * b * d; q[7] += w * c * c; q[8] += w * c * d;
        q[9] += w * d * d;
    }
    void add(const Quadric& o) { for (int i = 0; i < 10; ++i) q[i] += o.q[i]; }
    double eval(const float* p) const {
        const double x = p[0], y = p[1], z = p[2];
        return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z
             + 2 * q[3] * x + q[4] * y * y + 2 * q[5] * y * z
             + 2 * q[6] * y + q[7] * z * z + 2 * q[8] * z + q[9];
    }
};

struct HeapEntry {
    double cost;
    int32_t v, u;          // collapse v -> u (v disappears)
    uint32_t vv, uv;       // version stamps at push time
    bool operator<(const HeapEntry& o) const { return cost > o.cost; }
};

struct Ctx {
    const float* pos;
    int64_t nv, nt;
    std::vector<int32_t> parent;          // union-find
    std::vector<uint32_t> version;
    std::vector<Quadric> quad;
    std::vector<double> disp;             // accumulated displacement bound
    std::vector<uint8_t> locked;
    std::vector<int32_t> corners;         // (nt*3) live corner ids (resolved lazily)
    std::vector<uint8_t> tri_alive;
    std::vector<std::vector<int32_t>> vtris;  // vertex -> incident live tris

    int32_t find(int32_t v) {
        int32_t r = v;
        while (parent[r] != r) r = parent[r];
        while (parent[v] != r) { int32_t n = parent[v]; parent[v] = r; v = n; }
        return r;
    }
};

static inline void tri_normal(const float* a, const float* b, const float* c,
                              double n[3]) {
    const double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    const double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    n[0] = e1[1] * e2[2] - e1[2] * e2[1];
    n[1] = e1[2] * e2[0] - e1[0] * e2[2];
    n[2] = e1[0] * e2[1] - e1[1] * e2[0];
}

// Would collapsing v -> u flip (or degenerate) any surviving triangle
// around v?  Standard inversion guard: compare the normal with v at its
// old vs new (u's) position over triangles that keep all three corners.
static bool collapse_flips(Ctx& c, int32_t v, int32_t u) {
    for (int32_t t : c.vtris[v]) {
        if (!c.tri_alive[t]) continue;
        int32_t a = c.find(c.corners[3 * t]);
        int32_t b = c.find(c.corners[3 * t + 1]);
        int32_t d = c.find(c.corners[3 * t + 2]);
        if (a == u || b == u || d == u) continue;   // dies in the collapse
        const float* pa = (a == v) ? c.pos + 3 * u : c.pos + 3 * a;
        const float* pb = (b == v) ? c.pos + 3 * u : c.pos + 3 * b;
        const float* pd = (d == v) ? c.pos + 3 * u : c.pos + 3 * d;
        double n_new[3];
        tri_normal(pa, pb, pd, n_new);
        const float* qa = c.pos + 3 * a;
        const float* qb = c.pos + 3 * b;
        const float* qd = c.pos + 3 * d;
        double n_old[3];
        tri_normal(qa, qb, qd, n_old);
        const double dot = n_new[0] * n_old[0] + n_new[1] * n_old[1]
                         + n_new[2] * n_old[2];
        const double m_new = std::sqrt(n_new[0] * n_new[0]
                                       + n_new[1] * n_new[1]
                                       + n_new[2] * n_new[2]);
        const double m_old = std::sqrt(n_old[0] * n_old[0]
                                       + n_old[1] * n_old[1]
                                       + n_old[2] * n_old[2]);
        if (m_new < 1e-14 * m_old || dot < 0.25 * m_new * m_old) return true;
    }
    return false;
}

static void push_edges_of(Ctx& c, int32_t u,
                          std::priority_queue<HeapEntry>& heap) {
    // push both directions for every live edge incident to u
    for (int32_t t : c.vtris[u]) {
        if (!c.tri_alive[t]) continue;
        int32_t ids[3] = {c.find(c.corners[3 * t]),
                          c.find(c.corners[3 * t + 1]),
                          c.find(c.corners[3 * t + 2])};
        for (int k = 0; k < 3; ++k) {
            int32_t a = ids[k], b = ids[(k + 1) % 3];
            if (a != u && b != u) continue;
            if (a == b) continue;
            Quadric sum = c.quad[a];
            sum.add(c.quad[b]);
            if (!c.locked[a]) {
                double cost = sum.eval(c.pos + 3 * b);
                heap.push({cost, a, b, c.version[a], c.version[b]});
            }
            if (!c.locked[b]) {
                double cost = sum.eval(c.pos + 3 * a);
                heap.push({cost, b, a, c.version[b], c.version[a]});
            }
        }
    }
}

}  // namespace

extern "C" {

// QEM edge-collapse simplification with subset placement.
//   pos       (nv*3) f32 vertex positions
//   tris      (nt*3) i32 triangle corner ids
//   target    stop when live triangles <= target
//   lock      (nv) u8 or null: 1 = vertex must survive unmoved
//   out_tris  (nt) i32: indices of SURVIVING source triangles (count = ret)
//   vmap      (nv) i32: original vertex -> its final representative
//   out_err   (1) f32: conservative max surface displacement (object space)
// Returns the surviving triangle count, or -1 on malformed input.
int64_t vri_simplify_qem(const float* pos, int64_t nv,
                         const int32_t* tris, int64_t nt,
                         int64_t target, const uint8_t* lock,
                         int32_t* out_tris, int32_t* vmap, float* out_err) {
    if (nv <= 0 || nt <= 0) return -1;
    for (int64_t i = 0; i < 3 * nt; ++i)
        if (tris[i] < 0 || tris[i] >= nv) return -1;

    Ctx c;
    c.pos = pos; c.nv = nv; c.nt = nt;
    c.parent.resize(nv);
    c.version.assign(nv, 0);
    c.quad.resize(nv);
    c.disp.assign(nv, 0.0);
    c.locked.assign(nv, 0);
    c.corners.assign(tris, tris + 3 * nt);
    c.tri_alive.assign(nt, 1);
    c.vtris.resize(nv);
    for (int64_t v = 0; v < nv; ++v) { c.parent[v] = (int32_t)v; c.quad[v].zero(); }
    if (lock) for (int64_t v = 0; v < nv; ++v) c.locked[v] = lock[v];

    // plane quadrics (area-weighted) + adjacency
    int64_t live = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const int32_t a = tris[3 * t], b = tris[3 * t + 1], d = tris[3 * t + 2];
        if (a == b || b == d || a == d) { c.tri_alive[t] = 0; continue; }
        ++live;
        c.vtris[a].push_back((int32_t)t);
        c.vtris[b].push_back((int32_t)t);
        c.vtris[d].push_back((int32_t)t);
        double n[3];
        tri_normal(pos + 3 * a, pos + 3 * b, pos + 3 * d, n);
        const double m = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (m < 1e-20) continue;
        const double area = 0.5 * m;
        const double na = n[0] / m, nb = n[1] / m, nc = n[2] / m;
        const double nd = -(na * pos[3 * a] + nb * pos[3 * a + 1]
                            + nc * pos[3 * a + 2]);
        c.quad[a].add_plane(na, nb, nc, nd, area);
        c.quad[b].add_plane(na, nb, nc, nd, area);
        c.quad[d].add_plane(na, nb, nc, nd, area);
    }

    // boundary detection: an edge on != 2 live triangles locks both ends
    // (boundary-locked simplification is what keeps adjacent meshes /
    // clusters crack-free when they decimate independently)
    {
        std::unordered_map<uint64_t, int32_t> edge_count;
        edge_count.reserve((size_t)nt * 3);
        for (int64_t t = 0; t < nt; ++t) {
            if (!c.tri_alive[t]) continue;
            for (int k = 0; k < 3; ++k) {
                int64_t a = tris[3 * t + k], b = tris[3 * t + (k + 1) % 3];
                if (a > b) { int64_t s = a; a = b; b = s; }
                ++edge_count[((uint64_t)a << 32) | (uint64_t)b];
            }
        }
        for (const auto& kv : edge_count) {
            if (kv.second != 2) {
                c.locked[kv.first >> 32] = 1;
                c.locked[kv.first & 0xFFFFFFFFu] = 1;
            }
        }
    }

    std::priority_queue<HeapEntry> heap;
    {
        // initial edge set (deduped per direction)
        std::unordered_map<uint64_t, uint8_t> seen;
        seen.reserve((size_t)nt * 3);
        for (int64_t t = 0; t < nt; ++t) {
            if (!c.tri_alive[t]) continue;
            for (int k = 0; k < 3; ++k) {
                int32_t a = tris[3 * t + k], b = tris[3 * t + (k + 1) % 3];
                uint64_t key = ((uint64_t)(uint32_t)a << 32) | (uint32_t)b;
                if (seen.count(key)) continue;
                seen[key] = 1;
                if (c.locked[a]) continue;
                Quadric sum = c.quad[a];
                sum.add(c.quad[b]);
                heap.push({sum.eval(pos + 3 * b), a, b,
                           c.version[a], c.version[b]});
            }
        }
    }

    double max_disp = 0.0;
    while (live > target && !heap.empty()) {
        HeapEntry e = heap.top();
        heap.pop();
        int32_t v = e.v, u = e.u;
        if (c.version[v] != e.vv || c.version[u] != e.uv) continue;  // stale
        if (c.find(v) != v || c.find(u) != u || v == u) continue;
        if (c.locked[v]) continue;
        if (collapse_flips(c, v, u)) { ++c.version[v]; continue; }

        // collapse v -> u
        c.parent[v] = u;
        ++c.version[v];
        ++c.version[u];
        c.quad[u].add(c.quad[v]);
        const double dx = pos[3 * v] - pos[3 * u];
        const double dy = pos[3 * v + 1] - pos[3 * u + 1];
        const double dz = pos[3 * v + 2] - pos[3 * u + 2];
        const double step = std::sqrt(dx * dx + dy * dy + dz * dz);
        const double d_new = c.disp[v] + step;
        if (d_new > c.disp[u]) c.disp[u] = d_new;
        if (c.disp[u] > max_disp) max_disp = c.disp[u];

        // merge adjacency; kill degenerate triangles
        for (int32_t t : c.vtris[v]) {
            if (!c.tri_alive[t]) continue;
            int32_t a = c.find(c.corners[3 * t]);
            int32_t b = c.find(c.corners[3 * t + 1]);
            int32_t d = c.find(c.corners[3 * t + 2]);
            if (a == b || b == d || a == d) {
                c.tri_alive[t] = 0;
                --live;
            } else {
                c.vtris[u].push_back(t);
            }
        }
        c.vtris[v].clear();
        c.vtris[v].shrink_to_fit();
        push_edges_of(c, u, heap);
    }

    int64_t m = 0;
    for (int64_t t = 0; t < nt; ++t)
        if (c.tri_alive[t]) out_tris[m++] = (int32_t)t;
    for (int64_t v = 0; v < nv; ++v) vmap[v] = c.find((int32_t)v);
    *out_err = (float)max_disp;
    return m;
}

}  // extern "C"
