// Native mesh preprocessing for the TPU-native MPAS dycore.
//
// The reference's distribution machinery is Legion's C++ dependent
// partitioner (image/preimage chains, mesh_loading.rg:399-483, SURVEY.md
// section 2.6).  The TPU-native equivalent precomputes the same information
// host-side — partition assignment, multi-ring halos, and exchange tables —
// and this translation unit provides the scalable native implementation used
// for production meshes (x1.163842+), exposed through a plain C ABI consumed
// via ctypes (mpas_tpu/parallel/native.py).  A pure-numpy fallback with
// identical semantics lives in mpas_tpu/parallel/partition.py.
//
// Build: make -C native    (produces libmpas_mesh.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Recursive coordinate bisection on cell coordinates.
//   xyz:    [n_cells * 3] cell positions
//   assign: [n_cells] output partition ids in [0, n_parts)
// ---------------------------------------------------------------------------
static void rcb_split(const double* xyz, int32_t* assign,
                      std::vector<int64_t>& idx, int64_t lo_i, int64_t hi_i,
                      int32_t lo_p, int32_t hi_p) {
  const int64_t n = hi_i - lo_i;
  const int32_t parts = hi_p - lo_p;
  if (parts == 1) {
    for (int64_t i = lo_i; i < hi_i; ++i) assign[idx[i]] = lo_p;
    return;
  }
  // widest axis
  double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = lo_i; i < hi_i; ++i) {
    const double* p = xyz + 3 * idx[i];
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], p[d]);
      mx[d] = std::max(mx[d], p[d]);
    }
  }
  int axis = 0;
  double spread = -1.0;
  for (int d = 0; d < 3; ++d) {
    if (mx[d] - mn[d] > spread) { spread = mx[d] - mn[d]; axis = d; }
  }
  const int32_t left_parts = parts / 2;
  const int64_t k = lo_i + (int64_t)((double)n * left_parts / parts + 0.5);
  std::nth_element(idx.begin() + lo_i, idx.begin() + k, idx.begin() + hi_i,
                   [&](int64_t a, int64_t b) {
                     return xyz[3 * a + axis] < xyz[3 * b + axis];
                   });
  rcb_split(xyz, assign, idx, lo_i, k, lo_p, lo_p + left_parts);
  rcb_split(xyz, assign, idx, k, hi_i, lo_p + left_parts, hi_p);
}

void mpas_rcb_partition(const double* xyz, int64_t n_cells, int32_t n_parts,
                        int32_t* assign) {
  std::vector<int64_t> idx(n_cells);
  std::iota(idx.begin(), idx.end(), 0);
  rcb_split(xyz, assign, idx, 0, n_cells, 0, n_parts);
}

// ---------------------------------------------------------------------------
// Multi-ring halo growth for one shard.
//   cells_on_cell: [n_cells * max_edges] 0-based adjacency (invalid -> any)
//   n_edges_on_cell: [n_cells]
//   assign: [n_cells] partition ids
//   shard:  partition to build
//   rings:  halo depth
// Output: local_cells (owned first, then ring 1..rings, each ring sorted),
//   written into out (capacity cap); returns total count (or -1 if cap too
//   small); ring_offsets[r] = start of ring r (ring_offsets[0] = n_owned).
// ---------------------------------------------------------------------------
int64_t mpas_grow_rings(const int32_t* cells_on_cell,
                        const int32_t* n_edges_on_cell, int64_t n_cells,
                        int32_t max_edges, const int32_t* assign,
                        int32_t shard, int32_t rings, int32_t* out,
                        int64_t cap, int64_t* ring_offsets) {
  std::vector<uint8_t> in_local(n_cells, 0);
  int64_t count = 0;
  std::vector<int32_t> frontier;
  for (int64_t c = 0; c < n_cells; ++c) {
    if (assign[c] == shard) {
      if (count >= cap) return -1;
      out[count++] = (int32_t)c;
      in_local[c] = 1;
      frontier.push_back((int32_t)c);
    }
  }
  ring_offsets[0] = count;
  std::vector<int32_t> next;
  for (int32_t r = 0; r < rings; ++r) {
    next.clear();
    for (int32_t c : frontier) {
      const int32_t ne = n_edges_on_cell[c];
      for (int32_t j = 0; j < ne; ++j) {
        const int32_t nb = cells_on_cell[(int64_t)c * max_edges + j];
        if (nb >= 0 && nb < n_cells && !in_local[nb]) {
          in_local[nb] = 1;
          next.push_back(nb);
        }
      }
    }
    std::sort(next.begin(), next.end());
    for (int32_t c : next) {
      if (count >= cap) return -1;
      out[count++] = c;
    }
    ring_offsets[r + 1] = count;
    frontier = next;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Incident entity collection (edges or vertices of a set of cells),
// owned-first ordering.
//   ent_on_cell: [n_cells * width] 0-based entity ids
//   valid via n_on_cell (per cell count) — or width when n_on_cell == null
//   owner: [n_ent] owning shard of each entity
// Returns count written to out (owned entities of `shard` first, sorted,
// then halo entities sorted), and n_owned via *n_owned_out.
// ---------------------------------------------------------------------------
int64_t mpas_incident_entities(const int32_t* ent_on_cell,
                               const int32_t* n_on_cell, int32_t width,
                               const int32_t* local_cells, int64_t n_local,
                               int64_t n_ent, const int32_t* owner,
                               int32_t shard, int32_t* out, int64_t cap,
                               int64_t* n_owned_out) {
  std::vector<uint8_t> seen(n_ent, 0);
  std::vector<int32_t> owned, halo;
  for (int64_t i = 0; i < n_local; ++i) {
    const int32_t c = local_cells[i];
    const int32_t ne = n_on_cell ? n_on_cell[c] : width;
    for (int32_t j = 0; j < ne; ++j) {
      const int32_t e = ent_on_cell[(int64_t)c * width + j];
      if (e >= 0 && e < n_ent && !seen[e]) {
        seen[e] = 1;
        (owner[e] == shard ? owned : halo).push_back(e);
      }
    }
  }
  std::sort(owned.begin(), owned.end());
  std::sort(halo.begin(), halo.end());
  if ((int64_t)(owned.size() + halo.size()) > cap) return -1;
  int64_t k = 0;
  for (int32_t e : owned) out[k++] = e;
  for (int32_t e : halo) out[k++] = e;
  *n_owned_out = (int64_t)owned.size();
  return k;
}

// ---------------------------------------------------------------------------
// Legacy-interop escape hatch (the reference documents raw-pointer Fortran
// physics interop, fortran/examples.rg:24-59): a stand-in "legacy column
// scheme" written against plain raw pointers, called from inside the jitted
// dycore via jax.pure_callback (physics/legacy.py).  Layout matches the
// level-major device arrays: theta [K, C] row-major, theta_ref [K].
// ---------------------------------------------------------------------------
void legacy_column_relaxation(const double* theta, const double* theta_ref,
                              double tau, int64_t K, int64_t C,
                              double* tend) {
  for (int64_t k = 0; k < K; ++k) {
    const double ref = theta_ref[k];
    const double* row = theta + k * C;
    double* out = tend + k * C;
    for (int64_t c = 0; c < C; ++c) out[c] = -(row[c] - ref) / tau;
  }
}

}  // extern "C"
