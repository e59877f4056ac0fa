// Native host-side map bookkeeping kernels.
//
// The reference implements its map data structures in C++ (KeyFrame/MapPoint
// pointer graphs with per-object mutexes, reference src/KeyFrame.cc,
// src/MapPoint.cc). This framework's map is flat SoA arrays; the few
// host-side operations that are genuinely hot in the SLAM driver loop —
// covisibility counting, observation lookup, fuse/replace with per-keyframe
// de-duplication — are implemented here in C++ and bound via ctypes
// (no pybind11 in the image; plain C ABI).
//
// Build: g++ -O3 -march=native -shared -fPIC mapops.cpp -o libmapops.so
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Shared-map-point counts between keyframe `kf` and every other keyframe.
// feat_mp: (n_kf, n_feat) int32 map-point id per feature (-1 = none).
// out: (n_kf,) int32.
void covisibility_row(const int32_t* feat_mp, const uint8_t* kf_valid,
                      int64_t n_kf, int64_t n_feat, int64_t kf, int64_t max_mp,
                      int32_t* out) {
    std::vector<uint8_t> in_kf(max_mp, 0);
    const int32_t* row = feat_mp + kf * n_feat;
    for (int64_t i = 0; i < n_feat; ++i) {
        int32_t mp = row[i];
        if (mp >= 0 && mp < max_mp) in_kf[mp] = 1;
    }
    for (int64_t k = 0; k < n_kf; ++k) {
        int32_t c = 0;
        if (kf_valid[k] && k != kf) {
            const int32_t* r = feat_mp + k * n_feat;
            for (int64_t i = 0; i < n_feat; ++i) {
                int32_t mp = r[i];
                if (mp >= 0 && mp < max_mp && in_kf[mp]) ++c;
            }
        }
        out[k] = c;
    }
}

// Observation count per map point over valid keyframes. out: (max_mp,) int32.
void obs_counts(const int32_t* feat_mp, const uint8_t* kf_valid,
                int64_t n_kf, int64_t n_feat, int64_t max_mp, int32_t* out) {
    std::memset(out, 0, sizeof(int32_t) * max_mp);
    for (int64_t k = 0; k < n_kf; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* r = feat_mp + k * n_feat;
        for (int64_t i = 0; i < n_feat; ++i) {
            int32_t mp = r[i];
            if (mp >= 0 && mp < max_mp) ++out[mp];
        }
    }
}

// All observations of a set of map points (marked in `wanted`, size max_mp).
// Writes up to cap (kf_idx, feat_idx) pairs; returns the count.
int64_t observations_of(const int32_t* feat_mp, const uint8_t* kf_valid,
                        int64_t n_kf, int64_t n_feat, const uint8_t* wanted,
                        int64_t max_mp, int32_t* out_kf, int32_t* out_feat,
                        int64_t cap) {
    int64_t n = 0;
    for (int64_t k = 0; k < n_kf; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* r = feat_mp + k * n_feat;
        for (int64_t i = 0; i < n_feat; ++i) {
            int32_t mp = r[i];
            if (mp >= 0 && mp < max_mp && wanted[mp]) {
                if (n < cap) {
                    out_kf[n] = (int32_t)k;
                    out_feat[n] = (int32_t)i;
                }
                ++n;
            }
        }
    }
    return n < cap ? n : cap;
}

// Point replacement (fuse): rewrite ids via lut, then de-duplicate per
// keyframe (keep the first occurrence; reference MapPoint::Replace keeps a
// single observation per KF). feat_mp modified in place.
void replace_points(int32_t* feat_mp, int64_t n_kf, int64_t n_feat,
                    const int32_t* lut, int64_t max_mp) {
    std::vector<int32_t> seen(max_mp, -1);
    for (int64_t k = 0; k < n_kf; ++k) {
        int32_t* r = feat_mp + k * n_feat;
        for (int64_t i = 0; i < n_feat; ++i) {
            int32_t mp = r[i];
            if (mp < 0 || mp >= max_mp) continue;
            int32_t nid = lut[mp];
            if (nid < 0 || nid >= max_mp) { r[i] = -1; continue; }
            if (seen[nid] == (int32_t)k) {
                r[i] = -1;  // duplicate within this keyframe
            } else {
                seen[nid] = (int32_t)k;
                r[i] = nid;
            }
        }
    }
}

}  // extern "C"
