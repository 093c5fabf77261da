// Native host-side data preparation for the TPU GCANet framework.
//
// C++ equivalents of the reference's CPU-bound per-sample work:
//   * voxelize_idx hash-dedupe (softgroup/ops/src/voxelize/voxelize.cpp:11-96,
//     mode 4) — insertion-ordered dedupe of integer voxel coords into
//     (out_coords, p2v map) without the google dense_hash_map dependency.
//   * per-instance statistics + centroid offset labels
//     (dataloader/ABCDataset_new.py:157-178).
//   * small-instance relabelling (<=100 points -> background) and the
//     10 -> 7 primitive-class fold (ABCDataset_new.py:82-98).
//
// Exposed as a plain C ABI consumed through ctypes
// (gcanet_tpu/data/native.py); at 16+ dataloader workers these loops are the
// host-side bottleneck feeding a fast accelerator.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Insertion-ordered voxel dedupe. coords: [n, 4] int32 (batch, x, y, z).
// Returns number of voxels; fills p2v [n] and out_coords [n, 4] (first
// num_voxels rows valid).
int64_t gca_voxelize_idx(const int32_t* coords, int64_t n,
                         int32_t* p2v, int32_t* out_coords) {
  std::unordered_map<uint64_t, int32_t> seen;
  seen.reserve(static_cast<size_t>(n) * 2);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t b = coords[i * 4 + 0];
    const uint64_t x = static_cast<uint16_t>(coords[i * 4 + 1] + 32768);
    const uint64_t y = static_cast<uint16_t>(coords[i * 4 + 2] + 32768);
    const uint64_t z = static_cast<uint16_t>(coords[i * 4 + 3] + 32768);
    const uint64_t key = (static_cast<uint64_t>(b) << 48) | (x << 32) | (y << 16) | z;
    auto it = seen.find(key);
    int32_t v;
    if (it == seen.end()) {
      v = next++;
      seen.emplace(key, v);
      std::memcpy(out_coords + static_cast<int64_t>(v) * 4, coords + i * 4,
                  4 * sizeof(int32_t));
    } else {
      v = it->second;
    }
    p2v[i] = v;
  }
  return next;
}

// Per-instance stats + centroid offsets (ABCDataset_new.py:157-178).
// labels: [n] int32 instance ids (-1 background); xyz: [n, 3] float.
// Outputs: pointnum [max_inst], cls [max_inst] (semantic label of first
// point), offsets [n, 3] = instance centroid - xyz (or -100-xyz for bg).
// Returns number of instances (label max + 1, clipped to max_inst).
int32_t gca_instance_info(const float* xyz, const int32_t* labels,
                          const int32_t* semantic, int64_t n, int32_t max_inst,
                          int32_t* pointnum, int32_t* cls, float* offsets) {
  std::vector<double> sx(max_inst, 0.0), sy(max_inst, 0.0), sz(max_inst, 0.0);
  std::vector<int32_t> cnt(max_inst, 0);
  std::vector<int32_t> first(max_inst, -1);
  int32_t inst_num = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t l = labels[i];
    if (l < 0 || l >= max_inst) continue;
    if (l + 1 > inst_num) inst_num = l + 1;
    sx[l] += xyz[i * 3 + 0];
    sy[l] += xyz[i * 3 + 1];
    sz[l] += xyz[i * 3 + 2];
    if (cnt[l] == 0) first[l] = static_cast<int32_t>(i);
    cnt[l] += 1;
  }
  for (int32_t j = 0; j < max_inst; ++j) {
    pointnum[j] = cnt[j];
    cls[j] = (first[j] >= 0) ? semantic[first[j]] : 0;
  }
  for (int64_t i = 0; i < n; ++i) {
    const int32_t l = labels[i];
    if (l >= 0 && l < max_inst && cnt[l] > 0) {
      offsets[i * 3 + 0] = static_cast<float>(sx[l] / cnt[l]) - xyz[i * 3 + 0];
      offsets[i * 3 + 1] = static_cast<float>(sy[l] / cnt[l]) - xyz[i * 3 + 1];
      offsets[i * 3 + 2] = static_cast<float>(sz[l] / cnt[l]) - xyz[i * 3 + 2];
    } else {
      offsets[i * 3 + 0] = -100.0f - xyz[i * 3 + 0];
      offsets[i * 3 + 1] = -100.0f - xyz[i * 3 + 1];
      offsets[i * 3 + 2] = -100.0f - xyz[i * 3 + 2];
    }
  }
  return inst_num;
}

// Small-instance relabel + class fold (ABCDataset_new.py:82-98).
// raw_labels: [n] raw instance ids (>= 0); prim: [n] primitive classes.
// Outputs compact labels (-1 for instances with <= min_points points),
// clean_prim (-1 where background; 7/9 -> 6, 8 -> 2 when fold7 != 0).
void gca_relabel(const int64_t* raw_labels, const int64_t* prim, int64_t n,
                 int32_t min_points, int32_t fold7,
                 int32_t* labels_out, int32_t* prim_out) {
  std::unordered_map<int64_t, int32_t> count;
  count.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) count[raw_labels[i]]++;
  std::unordered_map<int64_t, int32_t> remap;
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t l = raw_labels[i];
    if (count[l] > min_points) {
      auto it = remap.find(l);
      if (it == remap.end()) {
        // assign ids in first-seen order of qualifying keys, matching the
        // python Counter iteration over insertion order
        remap.emplace(l, next);
        labels_out[i] = next++;
      } else {
        labels_out[i] = it->second;
      }
    } else {
      labels_out[i] = -1;
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = (labels_out[i] >= 0) ? prim[i] : -1;
    if (fold7 && p >= 0) {
      if (p == 7 || p == 9) p = 6;
      if (p == 8) p = 2;
    }
    prim_out[i] = static_cast<int32_t>(p);
  }
}

}  // extern "C"
