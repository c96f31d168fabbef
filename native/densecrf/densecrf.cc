// Fully-connected CRF with Gaussian edge potentials — mean-field inference.
//
// Fresh implementation of Krähenbühl & Koltun, "Efficient Inference in Fully
// Connected CRFs with Gaussian Edge Potentials" (NIPS 2011): unary + Potts
// pairwise terms (a 2-D spatial Gaussian kernel and a 5-D bilateral kernel),
// messages computed by permutohedral-lattice filtering with symmetric kernel
// normalization, parallel mean-field updates Q = softmax(-U + sum_k w_k K_k Q).
//
// This is the CPU fidelity path replacing the reference's `pydensecrf`
// dependency (used at contrast_infer.py:115-126, aff_prepare.py:34-50,
// tool/imutils.py:220-237, segmentation/lib/utils/DenseCRF.py:5-39).
// Exposed as a C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#include "permutohedral.h"

namespace wseg {

namespace {

// softmax over the label dim; in/out layout n x L
void exp_and_normalize(float* q, const float* src, int n, int L) {
  for (int i = 0; i < n; ++i) {
    const float* s = src + static_cast<size_t>(i) * L;
    float* d = q + static_cast<size_t>(i) * L;
    float mx = s[0];
    for (int l = 1; l < L; ++l) mx = std::max(mx, s[l]);
    float sum = 0.f;
    for (int l = 0; l < L; ++l) {
      d[l] = std::exp(s[l] - mx);
      sum += d[l];
    }
    const float inv = 1.0f / sum;
    for (int l = 0; l < L; ++l) d[l] *= inv;
  }
}

struct PottsKernel {
  Permutohedral lattice;
  std::vector<float> norm;  // symmetric normalization weights, size n
  float weight;             // compatibility weight w

  void init(const float* features, int d, int n, float w) {
    weight = w;
    lattice.init(features, d, n);
    std::vector<float> ones(n, 1.0f), filtered(n);
    lattice.compute(filtered.data(), ones.data(), 1);
    norm.resize(n);
    for (int i = 0; i < n; ++i)
      norm[i] = 1.0f / std::sqrt(std::max(filtered[i], 0.f) + 1e-20f);
  }

  // accumulate w * normalized-filter(Q) into `acc` (both n x L)
  void apply(float* acc, const float* q, int n, int L,
             std::vector<float>& tmp_in, std::vector<float>& tmp_out) const {
    tmp_in.resize(static_cast<size_t>(n) * L);
    tmp_out.resize(static_cast<size_t>(n) * L);
    for (int i = 0; i < n; ++i)
      for (int l = 0; l < L; ++l)
        tmp_in[static_cast<size_t>(i) * L + l] =
            q[static_cast<size_t>(i) * L + l] * norm[i];
    lattice.compute(tmp_out.data(), tmp_in.data(), L);
    for (int i = 0; i < n; ++i)
      for (int l = 0; l < L; ++l)
        acc[static_cast<size_t>(i) * L + l] +=
            weight * tmp_out[static_cast<size_t>(i) * L + l] * norm[i];
  }
};

}  // namespace
}  // namespace wseg

extern "C" {

// Batched variant: A independent unary fields over the SAME image share the
// (expensive) lattice builds — aff_prepare's 5-alpha sweep runs one lattice
// init per image instead of five (aff_prepare.py:76-86 runs one full CRF per
// alpha; the image, and therefore both kernels, are identical across alphas).
//
// unary: A x (H*W) x L row-major NEGATIVE log-probabilities (energy), i.e.
// the same convention as pydensecrf's setUnaryEnergy.
// rgb: H x W x 3 uint8 (may be null if bilateral_weight == 0).
// out: A x (H*W) x L marginals Q.
void wseg_densecrf_inference_multi(
    int H, int W, int L, int A, const float* unary, const unsigned char* rgb,
    int n_iters,
    float gaussian_sxy, float gaussian_weight,
    float bilateral_sxy, float bilateral_srgb, float bilateral_weight,
    float* out) {
  using wseg::PottsKernel;
  const int n = H * W;

  std::vector<PottsKernel> kernels;
  if (gaussian_weight != 0.f) {
    std::vector<float> feat(static_cast<size_t>(n) * 2);
    for (int y = 0; y < H; ++y)
      for (int x = 0; x < W; ++x) {
        feat[(static_cast<size_t>(y) * W + x) * 2 + 0] = x / gaussian_sxy;
        feat[(static_cast<size_t>(y) * W + x) * 2 + 1] = y / gaussian_sxy;
      }
    kernels.emplace_back();
    kernels.back().init(feat.data(), 2, n, gaussian_weight);
  }
  if (bilateral_weight != 0.f && rgb != nullptr) {
    std::vector<float> feat(static_cast<size_t>(n) * 5);
    for (int y = 0; y < H; ++y)
      for (int x = 0; x < W; ++x) {
        const size_t i = static_cast<size_t>(y) * W + x;
        feat[i * 5 + 0] = x / bilateral_sxy;
        feat[i * 5 + 1] = y / bilateral_sxy;
        feat[i * 5 + 2] = rgb[i * 3 + 0] / bilateral_srgb;
        feat[i * 5 + 3] = rgb[i * 3 + 1] / bilateral_srgb;
        feat[i * 5 + 4] = rgb[i * 3 + 2] / bilateral_srgb;
      }
    kernels.emplace_back();
    kernels.back().init(feat.data(), 5, n, bilateral_weight);
  }

  const size_t nl = static_cast<size_t>(n) * L;
  std::vector<float> neg_unary(nl), q(nl), acc(nl), tmp_in, tmp_out;
  for (int a = 0; a < A; ++a) {
    const float* u = unary + static_cast<size_t>(a) * nl;
    for (size_t i = 0; i < nl; ++i) neg_unary[i] = -u[i];

    wseg::exp_and_normalize(q.data(), neg_unary.data(), n, L);
    for (int it = 0; it < n_iters; ++it) {
      std::copy(neg_unary.begin(), neg_unary.end(), acc.begin());
      for (const auto& k : kernels)
        k.apply(acc.data(), q.data(), n, L, tmp_in, tmp_out);
      wseg::exp_and_normalize(q.data(), acc.data(), n, L);
    }
    std::copy(q.begin(), q.end(), out + static_cast<size_t>(a) * nl);
  }
}

// Single-unary entry (the pydensecrf-shaped call).
void wseg_densecrf_inference(
    int H, int W, int L, const float* unary, const unsigned char* rgb,
    int n_iters,
    float gaussian_sxy, float gaussian_weight,
    float bilateral_sxy, float bilateral_srgb, float bilateral_weight,
    float* out) {
  wseg_densecrf_inference_multi(
      H, W, L, 1, unary, rgb, n_iters, gaussian_sxy, gaussian_weight,
      bilateral_sxy, bilateral_srgb, bilateral_weight, out);
}

// Standalone high-dimensional Gaussian filter (for testing the lattice):
// filters `in` (n x vdim) by the Gaussian kernel over `features` (n x d).
void wseg_permutohedral_filter(
    const float* features, int d, int n, const float* in, int vdim, float* out) {
  wseg::Permutohedral lattice;
  lattice.init(features, d, n);
  lattice.compute(out, in, vdim);
}

}  // extern "C"
