// Permutohedral lattice for high-dimensional Gaussian filtering.
//
// Fresh implementation of the algorithm from Adams, Baek & Davis,
// "Fast High-Dimensional Filtering Using the Permutohedral Lattice"
// (Eurographics 2010): elevate features onto the hyperplane H_d, find the
// enclosing simplex of the permutohedral lattice, splat with barycentric
// weights into a hash table of occupied vertices, blur along each lattice
// direction with a [1 2 1]/4 kernel, and slice back.
//
// Replaces the third-party pydensecrf/densecrf permutohedral backend used by
// the reference (requirements.txt:3) — the TPU framework's CPU fidelity path
// for dense-CRF post-processing.
//
// The vertex table is a flat open-addressing (linear probe) hash with all
// keys in one contiguous int16 array: lattice build cost is dominated by
// hash traffic (n*(d+1) inserts + 2*(d+1)*m neighbor probes), and per-node
// heap keys (the obvious std::unordered_map<std::vector>) measure ~5x
// slower end-to-end on the 196k-point production images.

#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace wseg {

// Open-addressing hash of int16[key_size] keys; insertion order assigns
// dense vertex ids 0..size-1 and keys live contiguously in `keys_`.
class VertexTable {
 public:
  void init(int key_size, size_t max_entries) {
    key_size_ = key_size;
    size_ = 0;
    capacity_ = 16;
    while (capacity_ < max_entries * 2) capacity_ <<= 1;
    mask_ = capacity_ - 1;
    slots_.assign(capacity_, -1);
    keys_.clear();
    keys_.reserve(max_entries * key_size);
  }

  int size() const { return size_; }
  const int16_t* key(int32_t id) const {
    return keys_.data() + static_cast<size_t>(id) * key_size_;
  }

  int32_t find_or_insert(const int16_t* k) {
    size_t h = hash(k) & mask_;
    for (;;) {
      int32_t e = slots_[h];
      if (e < 0) {
        slots_[h] = size_;
        keys_.insert(keys_.end(), k, k + key_size_);
        return size_++;
      }
      if (equals(e, k)) return e;
      h = (h + 1) & mask_;
    }
  }

  int32_t find(const int16_t* k) const {
    size_t h = hash(k) & mask_;
    for (;;) {
      int32_t e = slots_[h];
      if (e < 0) return -1;
      if (equals(e, k)) return e;
      h = (h + 1) & mask_;
    }
  }

 private:
  size_t hash(const int16_t* k) const {
    size_t h = 0;
    for (int i = 0; i < key_size_; ++i)
      h = h * 2531011u + static_cast<uint16_t>(k[i]) * 2654435761u;
    return h;
  }

  bool equals(int32_t id, const int16_t* k) const {
    const int16_t* stored = keys_.data() + static_cast<size_t>(id) * key_size_;
    return std::memcmp(stored, k, key_size_ * sizeof(int16_t)) == 0;
  }

  int key_size_ = 0;
  int size_ = 0;
  size_t capacity_ = 0, mask_ = 0;
  std::vector<int32_t> slots_;  // capacity; -1 = empty, else vertex id
  std::vector<int16_t> keys_;   // size * key_size, insertion order
};

class Permutohedral {
 public:
  // features: n points, d dims, layout n x d (row-major).
  void init(const float* features, int d, int n);

  // in/out: n x vdim (row-major). out may not alias in.
  void compute(float* out, const float* in, int vdim) const;

  int n_points() const { return n_; }
  int n_vertices() const { return m_; }

 private:
  int d_ = 0;       // feature dims
  int n_ = 0;       // number of points
  int m_ = 0;       // number of occupied lattice vertices
  // per (point, simplex corner): vertex index and barycentric weight
  std::vector<int32_t> offset_;       // n * (d+1)
  std::vector<float> barycentric_;    // n * (d+1)
  // blur neighborhood: for each axis and vertex, the two neighbor indices
  std::vector<int32_t> blur_n1_, blur_n2_;  // (d+1) * m
};

inline void Permutohedral::init(const float* features, int d, int n) {
  d_ = d;
  n_ = n;
  const int dp1 = d + 1;
  offset_.assign(static_cast<size_t>(n) * dp1, 0);
  barycentric_.assign(static_cast<size_t>(n) * dp1, 0.f);

  // scale factors so that the blur has unit variance along each axis
  std::vector<float> scale(d);
  const float inv_std = std::sqrt(2.0f / 3.0f) * dp1;
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std / std::sqrt(static_cast<float>((i + 1) * (i + 2)));

  VertexTable table;
  table.init(d, static_cast<size_t>(n) * dp1);

  std::vector<float> elevated(dp1);
  std::vector<int> rem0(dp1), rank(dp1);
  std::vector<float> bary(dp1 + 2);
  std::vector<int16_t> key(d);

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<size_t>(p) * d;

    // --- elevate f into the hyperplane sum(x)=0 using the E basis ---
    float sm = 0.f;
    for (int i = d; i > 0; --i) {
      const float cf = f[i - 1] * scale[i - 1];
      elevated[i] = sm - i * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // --- nearest 0-colored lattice point (round to multiples of d+1) ---
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = elevated[i] / dp1;
      const int up = static_cast<int>(std::ceil(v)) * dp1;
      const int down = static_cast<int>(std::floor(v)) * dp1;
      rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
      sum += rem0[i];
    }
    sum /= dp1;

    // rank differential coordinates
    for (int i = 0; i <= d; ++i) rank[i] = 0;
    for (int i = 0; i < d; ++i)
      for (int j = i + 1; j <= d; ++j) {
        const float di = elevated[i] - rem0[i];
        const float dj = elevated[j] - rem0[j];
        if (di < dj)
          ++rank[i];
        else
          ++rank[j];
      }

    // repair points that rounded to the wrong remainder-plane
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += dp1;
        rem0[i] += dp1;
      } else if (rank[i] > d) {
        rank[i] -= dp1;
        rem0[i] -= dp1;
      }
    }

    // --- barycentric coordinates of the simplex enclosure ---
    for (int i = 0; i <= d + 1; ++i) bary[i] = 0.f;
    for (int i = 0; i <= d; ++i) {
      const float delta = (elevated[i] - rem0[i]) / dp1;
      bary[d - rank[i]] += delta;
      bary[d + 1 - rank[i]] -= delta;
    }
    bary[0] += 1.0f + bary[dp1];

    // --- splat targets: the d+1 simplex corners ---
    for (int corner = 0; corner <= d; ++corner) {
      for (int i = 0; i < d; ++i) {
        int16_t k = static_cast<int16_t>(rem0[i]);
        if (rank[i] > d - corner) k -= static_cast<int16_t>(dp1);
        key[i] = static_cast<int16_t>(k + corner);
      }
      const int32_t idx = table.find_or_insert(key.data());
      offset_[static_cast<size_t>(p) * dp1 + corner] = idx;
      barycentric_[static_cast<size_t>(p) * dp1 + corner] = bary[corner];
    }
  }

  m_ = table.size();

  // --- precompute blur neighbors per axis ---
  blur_n1_.assign(static_cast<size_t>(dp1) * m_, -1);
  blur_n2_.assign(static_cast<size_t>(dp1) * m_, -1);
  std::vector<int16_t> nkey(d);
  for (int axis = 0; axis <= d; ++axis) {
    for (int v = 0; v < m_; ++v) {
      const int16_t* k = table.key(v);
      // neighbor along +axis: key + 1 everywhere except -d at `axis`
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] + 1);
      if (axis < d) nkey[axis] = static_cast<int16_t>(k[axis] - d);
      const int32_t i1 = table.find(nkey.data());
      for (int i = 0; i < d; ++i)
        nkey[i] = static_cast<int16_t>(k[i] - 1);
      if (axis < d) nkey[axis] = static_cast<int16_t>(k[axis] + d);
      const int32_t i2 = table.find(nkey.data());
      blur_n1_[static_cast<size_t>(axis) * m_ + v] = i1;
      blur_n2_[static_cast<size_t>(axis) * m_ + v] = i2;
    }
  }
}

inline void Permutohedral::compute(float* out, const float* in, int vdim) const {
  const int dp1 = d_ + 1;
  std::vector<float> values(static_cast<size_t>(m_ + 1) * vdim, 0.f);
  std::vector<float> next(static_cast<size_t>(m_ + 1) * vdim, 0.f);

  // splat
  for (int p = 0; p < n_; ++p) {
    for (int c = 0; c <= d_; ++c) {
      const int32_t o = offset_[static_cast<size_t>(p) * dp1 + c];
      const float w = barycentric_[static_cast<size_t>(p) * dp1 + c];
      float* __restrict__ dst = values.data() + static_cast<size_t>(o) * vdim;
      const float* __restrict__ src = in + static_cast<size_t>(p) * vdim;
      for (int k = 0; k < vdim; ++k) dst[k] += w * src[k];
    }
  }

  // blur along each lattice axis: v <- (n1 + 2 v + n2) / 2 (the /2 keeps
  // the overall scale matching the splat/slice normalization below)
  const size_t zero_row = static_cast<size_t>(m_) * vdim;  // all-zeros row
  for (int axis = 0; axis <= d_; ++axis) {
    for (int v = 0; v < m_; ++v) {
      const int32_t i1 = blur_n1_[static_cast<size_t>(axis) * m_ + v];
      const int32_t i2 = blur_n2_[static_cast<size_t>(axis) * m_ + v];
      const float* __restrict__ r1 =
          values.data() + (i1 < 0 ? zero_row : static_cast<size_t>(i1) * vdim);
      const float* __restrict__ r2 =
          values.data() + (i2 < 0 ? zero_row : static_cast<size_t>(i2) * vdim);
      const float* __restrict__ r0 = values.data() + static_cast<size_t>(v) * vdim;
      float* __restrict__ dst = next.data() + static_cast<size_t>(v) * vdim;
      for (int k = 0; k < vdim; ++k) dst[k] = r0[k] + 0.5f * (r1[k] + r2[k]);
    }
    values.swap(next);
  }

  // slice (with the alpha correction factor from the paper)
  const float alpha = 1.0f / (1.0f + std::pow(2.0f, -d_));
  for (int p = 0; p < n_; ++p) {
    float* __restrict__ dst = out + static_cast<size_t>(p) * vdim;
    for (int k = 0; k < vdim; ++k) dst[k] = 0.f;
    for (int c = 0; c <= d_; ++c) {
      const int32_t o = offset_[static_cast<size_t>(p) * dp1 + c];
      const float w = alpha * barycentric_[static_cast<size_t>(p) * dp1 + c];
      const float* __restrict__ src = values.data() + static_cast<size_t>(o) * vdim;
      for (int k = 0; k < vdim; ++k) dst[k] += w * src[k];
    }
  }
}

}  // namespace wseg
