// Native host-side kernels for videotofaces_tpu.
//
// The reference delegates all host hot loops to dependency-native code
// (OpenCV C++, sklearn Cython). This library provides first-class native
// equivalents for the per-face host work that sits between TPU dispatches:
//
//   - ahash64_batch: BGR uint8 crops -> 64-bit average hashes
//     (BT.601 gray, 8x8 area average, > mean threshold; dupes.py:11-15)
//   - hamming_all_pairs_nearest: for each hash, distance+index of the nearest
//     EARLIER hash (the lower-triangle dedup reduction, dupes.py:51-64) —
//     popcount over packed uint64, O(N^2/2) without materializing the matrix
//   - hamming_prev_window: the prev-5 sliding-window check (dupes.py:18-48)
//
// Built with plain g++ (no pybind11); bound via ctypes with a numpy fallback.

#include <cstdint>
#include <cstring>

extern "C" {

// BGR uint8 [n, h, w, 3] (C-contiguous) -> packed hashes [n] uint64.
// Gray = round(0.299 R + 0.587 G + 0.114 B); 8x8 cells are adaptive-average
// windows; bit k set iff cell value > mean of the 64 cells.
void ahash64_batch(const uint8_t* imgs, int64_t n, int64_t h, int64_t w,
                   uint64_t* out) {
    const int64_t frame = h * w * 3;
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* img = imgs + i * frame;
        double cells[64];
        double total = 0.0;
        for (int cy = 0; cy < 8; cy++) {
            int64_t y0 = (cy * h) / 8, y1 = ((cy + 1) * h + 7) / 8;
            if (y1 <= y0) y1 = y0 + 1;
            for (int cx = 0; cx < 8; cx++) {
                int64_t x0 = (cx * w) / 8, x1 = ((cx + 1) * w + 7) / 8;
                if (x1 <= x0) x1 = x0 + 1;
                double acc = 0.0;
                for (int64_t y = y0; y < y1; y++) {
                    const uint8_t* row = img + (y * w + x0) * 3;
                    for (int64_t x = x0; x < x1; x++) {
                        const double b = row[0], g = row[1], r = row[2];
                        acc += 0.114 * b + 0.587 * g + 0.299 * r;
                        row += 3;
                    }
                }
                double v = acc / double((y1 - y0) * (x1 - x0));
                cells[cy * 8 + cx] = v;
                total += v;
            }
        }
        const double mean = total / 64.0;
        uint64_t bits = 0;
        for (int k = 0; k < 64; k++)
            if (cells[k] > mean) bits |= (uint64_t(1) << k);
        out[i] = bits;
    }
}

// For each i: min hamming distance to any j < i, and that j. dist[0] = 10000.
void hamming_all_pairs_nearest(const uint64_t* hashes, int64_t n,
                               int32_t* min_dist, int32_t* argmin) {
    for (int64_t i = 0; i < n; i++) {
        int best = 10000, bj = 0;
        for (int64_t j = 0; j < i; j++) {
            int d = __builtin_popcountll(hashes[i] ^ hashes[j]);
            if (d < best) { best = d; bj = int(j); }
        }
        min_dist[i] = best;
        argmin[i] = bj;
    }
}

// Sliding prev-window dedup (dupes.py:18-48 semantics): processes hashes in
// order, comparing each to the last `window` KEPT hashes; marks duplicates
// (dist <= thr). `seed` holds hashes already kept BEFORE this batch (the
// running per-video state), so the check continues seamlessly across batch
// boundaries. Reference indices returned in out_ref live in the concatenated
// namespace [seed..., hashes...]; out_ref = -1 only for the first face ever
// (nothing to compare against — kept unconditionally, like the reference).
// Returns the number of kept NEW hashes.
int64_t hamming_prev_window(const uint64_t* hashes, int64_t n, int window,
                            int thr, const uint64_t* seed, int64_t n_seed,
                            uint8_t* out_keep, int32_t* out_dist,
                            int32_t* out_ref) {
    int64_t kept_idx[4096];
    int64_t kept = 0;
    for (int64_t s = 0; s < n_seed; s++) kept_idx[kept++ % 4096] = s;
    for (int64_t i = 0; i < n; i++) {
        if (kept == 0) {
            out_keep[i] = 1; out_dist[i] = 10000; out_ref[i] = -1;
            kept_idx[kept++ % 4096] = n_seed + i;
            continue;
        }
        int64_t lo = kept > window ? kept - window : 0;
        int best = 1 << 30; int64_t bj = -1;
        for (int64_t k = lo; k < kept; k++) {
            int64_t j = kept_idx[k % 4096];
            uint64_t hj = j < n_seed ? seed[j] : hashes[j - n_seed];
            int d = __builtin_popcountll(hashes[i] ^ hj);
            if (d < best) { best = d; bj = j; }
        }
        out_dist[i] = best;
        out_ref[i] = int32_t(bj);
        if (best <= thr) {
            out_keep[i] = 0;
        } else {
            out_keep[i] = 1;
            kept_idx[kept++ % 4096] = n_seed + i;
        }
    }
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += out_keep[i];
    return total;
}

}  // extern "C"
