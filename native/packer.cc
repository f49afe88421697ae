// Host-side batch packer for the DiffSpectra-TPU input pipeline.
//
// TPU-native replacement for the host work the reference performs inside
// torch DataLoader workers + PyG C++ kernels (ref datasets/build_dataset.py:
// EdgeComSpectraTransform :94-149 and CollateSpectra :306-395): one-hot atom
// encoding, dense compressed edge tensors [exists; order/3; (aromatic)],
// node/edge masks with the diagonal removed, and log10(x+1) spectra
// normalisation — all fused in one cache-friendly pass per batch.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image). A numpy
// fallback with identical semantics lives in diffspectra_tpu/data/native.py
// and is cross-checked in tests/test_native_packer.py.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Pack one batch of (already row-gathered) raw molecule arrays into the
// dense model-facing tensors. All outputs must be pre-allocated.
//
//   atom_type  [B, N]      int64 atom vocabulary indices
//   pos        [B, N, 3]   float positions (copied through, padding zeroed)
//   edge_type  [B, N, N]   int64 bond orders (0..3, 4 = aromatic)
//   fc         [B, N]      int64 formal charges
//   num_atom   [B]         int64 true atom counts
//   spectra    [B, L]      float raw spectra (concatenated), optional (L==0)
//
// outputs:
//   atom_one_hot [B, N, A] float
//   edge_one_hot [B, N, N, C] float, C = 2 (+1 if include_aromatic)
//   node_mask    [B, N] float
//   edge_mask    [B, N, N] float (diagonal zeroed)
//   pos_out      [B, N, 3] float
//   fc_out       [B, N, 1] float
//   spectra_out  [B, L] float (log10(x+1) when use_normalize)
void pack_batch(const int64_t* atom_type, const float* pos,
                const int64_t* edge_type, const int64_t* fc,
                const int64_t* num_atom, const float* spectra, int64_t B,
                int64_t N, int64_t A, int include_aromatic, int use_normalize,
                int64_t L, float* atom_one_hot, float* edge_one_hot,
                float* node_mask, float* edge_mask, float* pos_out,
                float* fc_out, float* spectra_out) {
  const int64_t C = include_aromatic ? 3 : 2;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t n = num_atom[b];
    // node-level outputs
    for (int64_t i = 0; i < N; ++i) {
      const bool real = i < n;
      node_mask[b * N + i] = real ? 1.0f : 0.0f;
      const int64_t t = atom_type[b * N + i];
      float* oh = atom_one_hot + (b * N + i) * A;
      for (int64_t a = 0; a < A; ++a) oh[a] = 0.0f;
      if (real && t >= 0 && t < A) oh[t] = 1.0f;
      fc_out[b * N + i] = real ? static_cast<float>(fc[b * N + i]) : 0.0f;
      for (int64_t d = 0; d < 3; ++d)
        pos_out[(b * N + i) * 3 + d] =
            real ? pos[(b * N + i) * 3 + d] : 0.0f;
    }
    // edge-level outputs
    for (int64_t i = 0; i < N; ++i) {
      for (int64_t j = 0; j < N; ++j) {
        const bool real = (i < n) && (j < n) && (i != j);
        edge_mask[(b * N + i) * N + j] = real ? 1.0f : 0.0f;
        float* eo = edge_one_hot + ((b * N + i) * N + j) * C;
        const int64_t order = edge_type[(b * N + i) * N + j];
        // channel layout: [exists, order/3, (aromatic)]
        // (ref build_dataset.py:117-138: aromatic order 4 -> bond ch 0)
        const float bond = (order == 4) ? 0.0f : static_cast<float>(order) / 3.0f;
        const float arom = (order == 4) ? 1.0f : 0.0f;
        const bool has = real && (bond != 0.0f || (include_aromatic && arom != 0.0f));
        eo[0] = has ? 1.0f : 0.0f;
        eo[1] = real ? bond : 0.0f;
        if (include_aromatic) eo[2] = real ? arom : 0.0f;
      }
    }
    // spectra normalisation (ref :141-148)
    if (L > 0) {
      const float* src = spectra + b * L;
      float* dst = spectra_out + b * L;
      if (use_normalize) {
        for (int64_t l = 0; l < L; ++l) dst[l] = log10f(src[l] + 1.0f);
      } else {
        std::memcpy(dst, src, sizeof(float) * L);
      }
    }
  }
}

int packer_abi_version() { return 1; }

}  // extern "C"
