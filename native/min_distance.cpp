// Native greedy min-distance suppression for feature selection.
//
// Reference parity: selectGoodFeatures.py -> _enforceMinimumDistance /
// _fillFeaturemap (see SURVEY.md section 3.1). This is the one genuinely
// sequential step of the tracker (each acceptance masks later candidates),
// so it runs on the host; this C implementation replaces the NumPy/Python
// loop in ops/select.py (~100x faster on full-frame candidate lists) with
// identical results.
//
// Build: g++ -O2 -shared -fPIC -o libpft_native.so min_distance.cpp
// (driven automatically by pyfeaturetrack_tpu/utils/native.py)

#include <cstdint>
#include <cstring>

extern "C" {

// feats: [n_features * 3] (x, y, val) in/out, float64.
// xs/ys/vals: candidate coordinates/values; order: candidate visit order
// (already sorted by value desc, scan-order ties).
// Returns the number of filled slots.
int64_t pft_enforce_min_distance(
    const int64_t* xs, const int64_t* ys, const int64_t* vals,
    const int64_t* order, int64_t n_cand,
    double* feats, int64_t n_features,
    int64_t nrows, int64_t ncols,
    int64_t mindist, int64_t min_eigenvalue, int overwrite_all,
    uint8_t* featuremap /* nrows*ncols workspace, caller-zeroed */) {
  const double kNotFound = -1.0;  // KLT_NOT_FOUND
  mindist -= 1;                   // reference decrements before use
  // NOTE: mindist may go negative (cfg.mindist == 0); fill_map's ranges
  // are then empty, marking nothing — matching the Python/oracle path.

  auto fill_map = [&](int64_t x, int64_t y) {
    int64_t y0 = y - mindist, y1 = y + mindist;
    int64_t x0 = x - mindist, x1 = x + mindist;
    if (y0 < 0) y0 = 0;
    if (x0 < 0) x0 = 0;
    if (y1 > nrows - 1) y1 = nrows - 1;
    if (x1 > ncols - 1) x1 = ncols - 1;
    for (int64_t yy = y0; yy <= y1; ++yy)
      std::memset(featuremap + yy * ncols + x0, 1, (size_t)(x1 - x0 + 1));
  };

  if (!overwrite_all) {
    for (int64_t i = 0; i < n_features; ++i) {
      if (feats[i * 3 + 2] >= 0.0)
        fill_map((int64_t)feats[i * 3 + 0], (int64_t)feats[i * 3 + 1]);
    }
  }

  int64_t indx = 0, ci = 0, filled = 0;
  for (;;) {
    if (ci >= n_cand) {
      while (indx < n_features) {
        if (overwrite_all || feats[indx * 3 + 2] < 0.0) {
          feats[indx * 3 + 0] = -1.0;
          feats[indx * 3 + 1] = -1.0;
          feats[indx * 3 + 2] = kNotFound;
        }
        ++indx;
      }
      break;
    }
    const int64_t k = order[ci++];
    const int64_t x = xs[k], y = ys[k], val = vals[k];
    while (!overwrite_all && indx < n_features &&
           feats[indx * 3 + 2] >= 0.0)
      ++indx;
    if (indx >= n_features) break;
    if (!featuremap[y * ncols + x] && val >= min_eigenvalue) {
      feats[indx * 3 + 0] = (double)x;
      feats[indx * 3 + 1] = (double)y;
      feats[indx * 3 + 2] = (double)val;
      ++indx;
      ++filled;
      fill_map(x, y);
    }
  }
  return filled;
}

}  // extern "C"
