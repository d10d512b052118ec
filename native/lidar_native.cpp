// Native host-side runtime for lidar_brdf_tpu.
//
// The reference implements its scene pipeline in C++ + GLSL compute
// (Morton codes + GPU radix sort + PLOC merging, Group3D.cpp:41-181).  The
// TPU framework builds the BVH once per scene on the host; this library is
// the production-speed builder (the vectorized numpy fallback in
// geom/bvh.py stays as the portable reference implementation).
//
// Exposed via a C ABI for ctypes:
//   lbt_build_bvh:  triangle soup -> threaded LBVH in DFS pre-order
//                   (node_min/max, leaf face ids, skip links)
//   lbt_parse_obj_sizes / lbt_parse_obj: fast Wavefront OBJ reader
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblidar_native.so
//        lidar_native.cpp   (see build.py)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

// 30-bit Morton code, parity with computeMortonCodes-comp.glsl:17-46.
static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

static inline uint32_t morton3d(float nx, float ny, float nz) {
  auto q = [](float f) {
    int v = static_cast<int>(f * 1024.0f);
    return static_cast<uint32_t>(std::min(std::max(v, 0), 1023));
  };
  return expand_bits(q(nx)) * 4 + expand_bits(q(ny)) * 2 + expand_bits(q(nz));
}

static inline int clz64(uint64_t x) {
  return x ? __builtin_clzll(x) : 64;
}

struct RadixTree {
  // children encoding: id < n-1 internal, else leaf (id - (n-1)) in sorted
  // order (same convention as geom/bvh.py::_karras_radix_tree)
  std::vector<int64_t> left, right;
};

// Karras 2012 internal-node construction over unique 64-bit keys.
static RadixTree karras(const std::vector<uint64_t>& keys) {
  const int64_t n = static_cast<int64_t>(keys.size());
  const int64_t ni = n - 1;
  RadixTree t;
  t.left.resize(ni);
  t.right.resize(ni);

  auto delta = [&](int64_t i, int64_t j) -> int {
    if (j < 0 || j >= n) return -1;
    uint64_t x = keys[i] ^ keys[j];
    return clz64(x);
  };

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < ni; ++i) {
    int d = (delta(i, i + 1) - delta(i, i - 1)) > 0 ? 1 : -1;
    int delta_min = delta(i, i - d);
    int64_t lmax = 2;
    while (delta(i, i + lmax * d) > delta_min) lmax *= 2;
    int64_t l = 0;
    for (int64_t step = lmax / 2; step >= 1; step /= 2) {
      if (delta(i, i + (l + step) * d) > delta_min) l += step;
    }
    int64_t j = i + l * d;
    int delta_node = delta(i, j);
    int64_t s = 0;
    for (int64_t div = 2;; div *= 2) {
      int64_t step = (l + div - 1) / div;
      if (step < 1) break;
      if (delta(i, i + (s + step) * d) > delta_node) s += step;
      if (step == 1) break;
    }
    int64_t gamma = i + s * d + std::min<int64_t>(d, 0);
    int64_t lo = std::min(i, j);
    int64_t hi = std::max(i, j);
    t.left[i] = (lo == gamma) ? ni + gamma : gamma;
    t.right[i] = (hi == gamma + 1) ? ni + gamma + 1 : gamma + 1;
  }
  return t;
}

}  // namespace

extern "C" {

// Build a threaded LBVH.  Outputs must be pre-allocated for 2*num_faces-1
// nodes: node_min/node_max (3 floats each), node_face, node_skip (int32).
// Returns 0 on success.
int lbt_build_bvh(const float* vertices, int64_t num_vertices,
                  const int32_t* faces, int64_t num_faces, float* node_min,
                  float* node_max, int32_t* node_face, int32_t* node_skip) {
  if (num_faces < 1) return 1;
  const int64_t n = num_faces;
  const int64_t ni = n - 1;
  const int64_t total = 2 * n - 1;

  std::vector<V3> fmin(n), fmax(n);
  V3 smin = {3.4e38f, 3.4e38f, 3.4e38f}, smax = {-3.4e38f, -3.4e38f, -3.4e38f};
  for (int64_t f = 0; f < n; ++f) {
    const int32_t* tri = faces + 3 * f;
    V3 a = {vertices[3 * tri[0]], vertices[3 * tri[0] + 1],
            vertices[3 * tri[0] + 2]};
    V3 b = {vertices[3 * tri[1]], vertices[3 * tri[1] + 1],
            vertices[3 * tri[1] + 2]};
    V3 c = {vertices[3 * tri[2]], vertices[3 * tri[2] + 1],
            vertices[3 * tri[2] + 2]};
    fmin[f] = vmin(a, vmin(b, c));
    fmax[f] = vmax(a, vmax(b, c));
    smin = vmin(smin, fmin[f]);
    smax = vmax(smax, fmax[f]);
  }

  if (n == 1) {
    std::memcpy(node_min, &fmin[0], 12);
    std::memcpy(node_max, &fmax[0], 12);
    node_face[0] = 0;
    node_skip[0] = 1;
    return 0;
  }

  V3 ext = {std::max(smax.x - smin.x, 1e-12f),
            std::max(smax.y - smin.y, 1e-12f),
            std::max(smax.z - smin.z, 1e-12f)};

  // sort keys: morton(30) << 32 | index  (unique)
  std::vector<uint64_t> keys(n);
  for (int64_t f = 0; f < n; ++f) {
    float cx = 0.5f * (fmin[f].x + fmax[f].x);
    float cy = 0.5f * (fmin[f].y + fmax[f].y);
    float cz = 0.5f * (fmin[f].z + fmax[f].z);
    uint32_t m = morton3d((cx - smin.x) / ext.x, (cy - smin.y) / ext.y,
                          (cz - smin.z) / ext.z);
    keys[f] = (static_cast<uint64_t>(m) << 32) | static_cast<uint64_t>(f);
  }
  std::sort(keys.begin(), keys.end());
  std::vector<int64_t> order(n);
  std::vector<uint64_t> sorted_keys(n);
  for (int64_t i = 0; i < n; ++i) {
    order[i] = static_cast<int64_t>(keys[i] & 0xFFFFFFFFull);
    sorted_keys[i] = keys[i];
  }

  RadixTree tree = karras(sorted_keys);

  // node arrays: internal 0..ni-1, leaves ni..2n-2
  std::vector<V3> nmin(total), nmax(total);
  std::vector<int64_t> size(total, 1), parent(total, -1);
  for (int64_t i = 0; i < ni; ++i) {
    parent[tree.left[i]] = i;
    parent[tree.right[i]] = i;
  }
  for (int64_t i = 0; i < n; ++i) {
    nmin[ni + i] = fmin[order[i]];
    nmax[ni + i] = fmax[order[i]];
  }
  // bottom-up AABB/size: children of internal node always have higher
  // post-order rank than... not guaranteed by index; do an explicit
  // topological pass: count children resolved.
  {
    std::vector<int8_t> pending(ni, 2);
    std::vector<int64_t> stack;
    stack.reserve(n);
    for (int64_t leaf = ni; leaf < total; ++leaf) {
      int64_t cur = leaf;
      while (true) {
        int64_t p = parent[cur];
        if (p < 0) break;
        if (--pending[p] > 0) break;  // wait for sibling
        nmin[p] = vmin(nmin[tree.left[p]], nmin[tree.right[p]]);
        nmax[p] = vmax(nmax[tree.left[p]], nmax[tree.right[p]]);
        size[p] = 1 + size[tree.left[p]] + size[tree.right[p]];
        cur = p;
      }
    }
  }

  // DFS pre-order + skip links, iterative.
  std::vector<int64_t> pre(total), skip(total);
  {
    struct Item {
      int64_t node, preorder, skipto;
    };
    std::vector<Item> stack;
    stack.push_back({0, 0, total});
    while (!stack.empty()) {
      Item it = stack.back();
      stack.pop_back();
      pre[it.node] = it.preorder;
      skip[it.node] = it.skipto;
      if (it.node < ni) {
        int64_t l = tree.left[it.node], r = tree.right[it.node];
        int64_t rpre = it.preorder + 1 + size[l];
        stack.push_back({r, rpre, it.skipto});
        stack.push_back({l, it.preorder + 1, rpre});
      }
    }
  }

  for (int64_t i = 0; i < total; ++i) {
    int64_t p = pre[i];
    node_min[3 * p] = nmin[i].x;
    node_min[3 * p + 1] = nmin[i].y;
    node_min[3 * p + 2] = nmin[i].z;
    node_max[3 * p] = nmax[i].x;
    node_max[3 * p + 1] = nmax[i].y;
    node_max[3 * p + 2] = nmax[i].z;
    node_skip[p] = static_cast<int32_t>(skip[i]);
    node_face[p] =
        (i >= ni) ? static_cast<int32_t>(order[i - ni]) : int32_t(-1);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Fast OBJ reader (positions + triangulated faces only; attribute resolution
// stays in Python).  Two-phase: sizes, then fill.
// ---------------------------------------------------------------------------

struct ObjData {
  std::vector<float> positions;
  std::vector<int32_t> faces;        // triangle vertex indices (position ids)
  std::vector<int64_t> comp_start;   // face index where each component starts
};

static bool parse_obj_impl(const char* path, ObjData* out) {
  FILE* fh = std::fopen(path, "rb");
  if (!fh) return false;
  char line[8192];
  std::vector<int64_t> poly;
  bool new_comp = true;
  while (std::fgets(line, sizeof(line), fh)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        out->positions.push_back(x);
        out->positions.push_back(y);
        out->positions.push_back(z);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      if (new_comp) {
        out->comp_start.push_back(
            static_cast<int64_t>(out->faces.size() / 3));
        new_comp = false;
      }
      poly.clear();
      const char* p = line + 2;
      const int64_t nverts =
          static_cast<int64_t>(out->positions.size() / 3);
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long vi = std::strtol(p, const_cast<char**>(&p), 10);
        if (vi < 0) vi = nverts + vi + 1;
        poly.push_back(vi - 1);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /vt/vn
      }
      for (size_t k = 1; k + 1 < poly.size(); ++k) {
        out->faces.push_back(static_cast<int32_t>(poly[0]));
        out->faces.push_back(static_cast<int32_t>(poly[k]));
        out->faces.push_back(static_cast<int32_t>(poly[k + 1]));
      }
    } else if (line[0] == 'o' || line[0] == 'g') {
      new_comp = true;
    }
  }
  std::fclose(fh);
  return true;
}

static ObjData* g_last_obj = nullptr;

int lbt_parse_obj_sizes(const char* path, int64_t* num_vertices,
                        int64_t* num_faces, int64_t* num_components) {
  delete g_last_obj;
  g_last_obj = new ObjData();
  if (!parse_obj_impl(path, g_last_obj)) {
    delete g_last_obj;
    g_last_obj = nullptr;
    return 1;
  }
  *num_vertices = static_cast<int64_t>(g_last_obj->positions.size() / 3);
  *num_faces = static_cast<int64_t>(g_last_obj->faces.size() / 3);
  *num_components = static_cast<int64_t>(g_last_obj->comp_start.size());
  return 0;
}

int lbt_parse_obj_fill(float* vertices, int32_t* faces,
                       int64_t* comp_start) {
  if (!g_last_obj) return 1;
  std::memcpy(vertices, g_last_obj->positions.data(),
              g_last_obj->positions.size() * sizeof(float));
  std::memcpy(faces, g_last_obj->faces.data(),
              g_last_obj->faces.size() * sizeof(int32_t));
  std::memcpy(comp_start, g_last_obj->comp_start.data(),
              g_last_obj->comp_start.size() * sizeof(int64_t));
  delete g_last_obj;
  g_last_obj = nullptr;
  return 0;
}

}  // extern "C"
