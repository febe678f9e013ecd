// Native (C++) mesh-preprocessing kernels — the rebuild's equivalent of the
// reference's C-level mesh layer (SURVEY.md §3.1 item 3: PETSc DMPlex +
// METIS partitioning).  Hot setup-time operations that are O(E log E) in
// Python/NumPy become tight sorts here for large meshes:
//
//   * pair_face_nodes: lexicographic sort-and-match of per-face-node
//     geometric keys (the core of DG connectivity construction)
//   * morton_codes: space-filling-curve codes for element partitioning
//
// Exposed with a plain C ABI and loaded from Python via ctypes
// (seigen_tpu/mesh/native/__init__.py); the NumPy implementation in
// mesh/discrete.py and parallel/partition.py is the correctness oracle
// (tests/test_native.py checks exact agreement).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// keys: (n_rows, keylen) row-major int64.  partner_out[i] = j such that rows
// i and j have identical keys (j == i for unmatched rows).  Returns the
// maximum multiplicity seen (so the caller can reject non-manifold input
// where a key appears more than twice).
int64_t pair_face_nodes(const int64_t* keys, int64_t n_rows, int32_t keylen,
                        int64_t* partner_out) {
  std::vector<int64_t> idx(n_rows);
  std::iota(idx.begin(), idx.end(), 0);

  auto cmp = [keys, keylen](int64_t a, int64_t b) {
    const int64_t* ra = keys + a * keylen;
    const int64_t* rb = keys + b * keylen;
    for (int32_t k = 0; k < keylen; ++k) {
      if (ra[k] != rb[k]) return ra[k] < rb[k];
    }
    return a < b;  // stable tie-break
  };
  std::sort(idx.begin(), idx.end(), cmp);

  auto eq = [keys, keylen](int64_t a, int64_t b) {
    return std::memcmp(keys + a * keylen, keys + b * keylen,
                       sizeof(int64_t) * keylen) == 0;
  };

  int64_t max_mult = 0;
  int64_t i = 0;
  while (i < n_rows) {
    int64_t j = i + 1;
    while (j < n_rows && eq(idx[i], idx[j])) ++j;
    int64_t mult = j - i;
    max_mult = std::max(max_mult, mult);
    if (mult == 2) {
      partner_out[idx[i]] = idx[i + 1];
      partner_out[idx[i + 1]] = idx[i];
    } else {
      for (int64_t k = i; k < j; ++k) partner_out[idx[k]] = idx[k];
    }
    i = j;
  }
  return max_mult;
}

// q: (n, dim) row-major quantized coordinates (16-bit range); codes_out: (n,)
void morton_codes(const uint32_t* q, int64_t n, int32_t dim, int32_t bits,
                  uint64_t* codes_out) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t code = 0;
    for (int32_t b = 0; b < bits; ++b) {
      for (int32_t d = 0; d < dim; ++d) {
        code |= static_cast<uint64_t>((q[i * dim + d] >> b) & 1u)
                << (b * dim + d);
      }
    }
    codes_out[i] = code;
  }
}

// argsort of uint64 codes -> perm_out (n,) int64
void argsort_u64(const uint64_t* codes, int64_t n, int64_t* perm_out) {
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [codes](int64_t a, int64_t b) {
    return codes[a] < codes[b];
  });
  std::memcpy(perm_out, idx.data(), sizeof(int64_t) * n);
}

}  // extern "C"

extern "C" {

// Decode partner slots into neighbour node ids + boundary flags in one pass.
// partner: (E*nf*nfp,) slot ids; fnodes: (nf*nfp,) local node ids
// nbr_out[i] = (partner[i] / (nf*nfp)) * n_p + fnodes[partner[i] % (nf*nfp)]
// self_out[face] = all slots of the face map to themselves (boundary).
void decode_partners(const int64_t* partner, int64_t n_rows, int32_t nf,
                     int32_t nfp, int32_t n_p, const int64_t* fnodes,
                     int32_t* nbr_out, uint8_t* selfpair_out) {
  const int64_t per_elem = static_cast<int64_t>(nf) * nfp;
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t p = partner[i];
    const int64_t e = p / per_elem;
    const int64_t slot = p % per_elem;
    nbr_out[i] = static_cast<int32_t>(e * n_p + fnodes[slot]);
    selfpair_out[i] = (p == i) ? 1 : 0;
  }
}

}  // extern "C"
