// CMVN accumulation/application kernels (role of Kaldi's compute-cmvn-stats
// and apply-cmvn C++ binaries, reference run.sh:38-41).  The Python layer
// handles tables/speaker maps; these do the per-matrix float work.

#include <cmath>
#include <cstdint>

extern "C" {

// Accumulate one matrix into stats [2, dim+1] (Kaldi layout: row 0 = sums +
// frame count in last col, row 1 = sum of squares).
int pka_cmvn_accumulate(const float* mat, int32_t rows, int32_t cols,
                        double* stats) {
  double* sums = stats;
  double* sqs = stats + cols + 1;
  for (int32_t i = 0; i < rows; ++i) {
    const float* row = mat + static_cast<int64_t>(i) * cols;
    for (int32_t j = 0; j < cols; ++j) {
      sums[j] += row[j];
      sqs[j] += static_cast<double>(row[j]) * row[j];
    }
  }
  sums[cols] += rows;
  return 0;
}

// Apply mean (and optionally variance) normalization in place.
int pka_cmvn_apply(float* mat, int32_t rows, int32_t cols,
                   const double* stats, int norm_vars) {
  const double* sums = stats;
  const double* sqs = stats + cols + 1;
  const double count = sums[cols];
  if (count <= 0) return -1;
  for (int32_t j = 0; j < cols; ++j) {
    const double mean = sums[j] / count;
    double scale = 1.0;
    if (norm_vars) {
      double var = sqs[j] / count - mean * mean;
      if (var < 1e-20) var = 1e-20;
      scale = 1.0 / std::sqrt(var);
    }
    for (int32_t i = 0; i < rows; ++i) {
      float* v = mat + static_cast<int64_t>(i) * cols + j;
      *v = static_cast<float>((*v - mean) * scale);
    }
  }
  return 0;
}

}  // extern "C"
