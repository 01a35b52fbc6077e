// Native skeleton-augmentation core for the NW-UCLA/NTU data pipeline.
//
// Implements the per-sample preprocessing math of the Python feeder
// (tamgcn_tpu/data/feeder_nucla_gcn.py, reference feeder/feeder_nucla_gcn.py
// :85-130): center on joint 1 of frame 0, random 3-D view rotation + scale
// (train), per-sample min-max normalisation to [-1, 1], temporal resampling
// (train: sorted random-with-replacement; eval: linspace), and bone/motion
// modality derivation — batched and OpenMP-parallel, so the host CPU keeps a
// TPU fed at pod scale where the Python/numpy path cannot.
//
// Randomness: counter-based splitmix64/xoshiro256** streams keyed on
// (seed, epoch, index) — deterministic and shard-safe like the numpy Philox
// path (but an independent stream; the eval path is bit-exact with numpy).
//
// C ABI only (consumed via ctypes; no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Xoshiro256 {
  uint64_t s[4];

  static uint64_t splitmix64(uint64_t& x) {
    x += 0x9E3779B97f4A7C15ULL;
    uint64_t z = x;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }

  explicit Xoshiro256(uint64_t seed, uint64_t epoch, uint64_t index) {
    uint64_t x = seed * 0x9E3779B97f4A7C15ULL + epoch * 0xBF58476D1CE4E5B9ULL +
                 index + 0x94D049BB133111EBULL;
    for (auto& si : s) si = splitmix64(x);
  }

  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }

  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  // uniform double in [0, 1)
  double uniform() { return (next() >> 11) * 0x1.0p-53; }

  // uniform integer in [lo, hi] inclusive
  int64_t randint(int64_t lo, int64_t hi) {
    return lo + static_cast<int64_t>(uniform() * double(hi - lo + 1));
  }
};

// bone (child, parent) pairs, 1-based, NW-UCLA 20 joints
// (reference feeder_nucla_gcn.py:27-28)
const int kBonesNucla[20][2] = {
    {1, 2},  {2, 3},   {3, 3},   {4, 3},   {5, 3},   {6, 5},   {7, 6},
    {8, 7},  {9, 3},   {10, 9},  {11, 10}, {12, 11}, {13, 1},  {14, 13},
    {15, 14}, {16, 15}, {17, 1},  {18, 17}, {19, 18}, {20, 19}};

// NTU RGB+D Kinect-v2 25-joint bone pairs (graphs/ntu_rgb_d.py inward edges
// plus the spine-shoulder root)
const int kBonesNtu[25][2] = {
    {1, 2},   {2, 21},  {3, 21},  {4, 3},   {5, 21},  {6, 5},   {7, 6},
    {8, 7},   {9, 21},  {10, 9},  {11, 10}, {12, 11}, {13, 1},  {14, 13},
    {15, 14}, {16, 15}, {17, 1},  {18, 17}, {19, 18}, {20, 19}, {21, 21},
    {22, 23}, {23, 8},  {24, 25}, {25, 12}};

// bone table for a joint count; nullptr when none exists
inline const int (*bone_table(int V))[2] {
  if (V == 20) return kBonesNucla;
  if (V == 25) return kBonesNtu;
  return nullptr;
}

enum Modality { kJoint = 0, kBone = 1, kMotion = 2 };

// One sample: skeleton (T_in, V, 3) float64 -> out (3, T_out, V, 1) float32.
void augment_one(const double* skel, int t_in, int V, int t_out, int train,
                 int modality, uint64_t seed, uint64_t epoch, uint64_t index,
                 float* out) {
  Xoshiro256 rng(seed, epoch, index);

  double agx = 0.0, agy = 0.0, sc = 1.0;
  if (train) {
    agx = double(rng.randint(-60, 60)) * M_PI / 180.0;
    agy = double(rng.randint(-60, 60)) * M_PI / 180.0;
    sc = 0.5 + rng.uniform();
  }
  // rotation matrix Ry @ Rx @ S (reference :75-83); applied as row-vector
  // x' = x @ M, i.e. out[j] = sum_i x[i] * M[i][j]
  const double cx = std::cos(agx), sx = std::sin(agx);
  const double cy = std::cos(agy), sy = std::sin(agy);
  // Rx = [[1,0,0],[0,cx,sx],[0,-sx,cx]], Ry = [[cy,0,-sy],[0,1,0],[sy,0,cy]]
  // M = Ry @ Rx @ diag(s)
  double M[3][3] = {
      {cy * sc, 0.0, -sy * sc},
      {sx * sy * sc, cx * sc, sx * cy * sc},
      {cx * sy * sc, -sx * sc, cx * cy * sc},
  };

  const int n = t_in * V;
  std::vector<double> buf(size_t(n) * 3);
  // center on joint 1 (index 1) of frame 0, then rotate/scale
  const double c0 = skel[0 * V * 3 + 1 * 3 + 0];
  const double c1 = skel[0 * V * 3 + 1 * 3 + 1];
  const double c2 = skel[0 * V * 3 + 1 * 3 + 2];
  double vmin[3] = {1e300, 1e300, 1e300}, vmax[3] = {-1e300, -1e300, -1e300};
  for (int i = 0; i < n; ++i) {
    const double x = skel[i * 3 + 0] - c0;
    const double y = skel[i * 3 + 1] - c1;
    const double z = skel[i * 3 + 2] - c2;
    for (int j = 0; j < 3; ++j) {
      const double v = x * M[0][j] + y * M[1][j] + z * M[2][j];
      buf[size_t(i) * 3 + j] = v;
      vmin[j] = std::min(vmin[j], v);
      vmax[j] = std::max(vmax[j], v);
    }
  }
  // min-max normalise to [-1, 1] per coordinate axis (reference :102-105)
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < 3; ++j)
      buf[size_t(i) * 3 + j] =
          (buf[size_t(i) * 3 + j] - vmin[j]) / (vmax[j] - vmin[j] + 1e-6) * 2.0 -
          1.0;

  // temporal resample indices (reference :108-117)
  std::vector<int> idx(t_out);
  if (train) {
    for (int t = 0; t < t_out; ++t)
      idx[t] = int(rng.randint(0, t_in - 1));
    std::sort(idx.begin(), idx.end());
  } else {
    for (int t = 0; t < t_out; ++t)
      idx[t] = (t_in == 1) ? 0
                           : int(double(t) * double(t_in - 1) / double(t_out - 1));
  }

  // gather to (T_out, V, 3)
  std::vector<double> data(size_t(t_out) * V * 3);
  for (int t = 0; t < t_out; ++t)
    std::memcpy(&data[size_t(t) * V * 3], &buf[size_t(idx[t]) * V * 3],
                sizeof(double) * V * 3);

  const int(*bones)[2] = bone_table(V);
  if (modality == kBone && bones != nullptr) {  // (reference :119-123)
    std::vector<double> bone(size_t(t_out) * V * 3, 0.0);
    for (int t = 0; t < t_out; ++t)
      for (int b = 0; b < V; ++b) {
        const int child = bones[b][0] - 1, parent = bones[b][1] - 1;
        for (int c = 0; c < 3; ++c)
          bone[(size_t(t) * V + child) * 3 + c] =
              data[(size_t(t) * V + child) * 3 + c] -
              data[(size_t(t) * V + parent) * 3 + c];
      }
    data.swap(bone);
  } else if (modality == kMotion) {  // (reference :124-127)
    std::vector<double> motion(size_t(t_out) * V * 3, 0.0);
    for (int t = 0; t + 1 < t_out; ++t)
      for (int i = 0; i < V * 3; ++i)
        motion[size_t(t) * V * 3 + i] =
            data[size_t(t + 1) * V * 3 + i] - data[size_t(t) * V * 3 + i];
    data.swap(motion);
  }

  // layout to (3, T_out, V, 1) float32
  for (int c = 0; c < 3; ++c)
    for (int t = 0; t < t_out; ++t)
      for (int v = 0; v < V; ++v)
        out[(size_t(c) * t_out + t) * V + v] =
            float(data[(size_t(t) * V + v) * 3 + c]);
}

}  // namespace

extern "C" {

// Batched augmentation.
//   skeletons: concatenated (T_i, V, 3) float64 samples
//   offsets:   batch+1 prefix offsets (in frames) into `skeletons`
//   indices:   per-slot RNG stream index (the dataset index)
//   out:       (batch, 3, t_out, V, 1) float32
void tamgcn_augment_batch(const double* skeletons, const int64_t* offsets,
                          const int64_t* indices, int batch, int V, int t_out,
                          int train, int modality, uint64_t seed,
                          uint64_t epoch, float* out) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; ++b) {
    const int64_t begin = offsets[b], end = offsets[b + 1];
    augment_one(skeletons + begin * V * 3, int(end - begin), V, t_out, train,
                modality, seed, epoch, uint64_t(indices[b]),
                out + size_t(b) * 3 * t_out * V);
  }
}

int tamgcn_version() { return 2; }

}  // extern "C"
