// meshops: native mesh processing for renderformer_tpu's data plane.
//
// Replaces the reference's pymeshlab (C++ MeshLab) dependency
// (/root/reference/scene_processor/remesh.py:19-31) with an in-tree
// implementation exposed over a C ABI for ctypes:
//   * meshops_decimate          — QSlim-style quadric-error edge collapse
//   * meshops_isotropic_remesh  — split / collapse / flip / relax passes
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
};

// Symmetric 4x4 quadric, 10 coefficients.
struct Quadric {
  double q[10] = {0};
  void addPlane(double a, double b, double c, double d) {
    q[0] += a * a; q[1] += a * b; q[2] += a * c; q[3] += a * d;
    q[4] += b * b; q[5] += b * c; q[6] += b * d;
    q[7] += c * c; q[8] += c * d;
    q[9] += d * d;
  }
  Quadric operator+(const Quadric& o) const {
    Quadric r;
    for (int i = 0; i < 10; ++i) r.q[i] = q[i] + o.q[i];
    return r;
  }
  double eval(const Vec3& v) const {
    return q[0] * v.x * v.x + 2 * q[1] * v.x * v.y + 2 * q[2] * v.x * v.z +
           2 * q[3] * v.x + q[4] * v.y * v.y + 2 * q[5] * v.y * v.z +
           2 * q[6] * v.y + q[7] * v.z * v.z + 2 * q[8] * v.z + q[9];
  }
  // Solve for the minimizing position; false if near-singular.
  bool optimal(Vec3* out) const {
    double m[9] = {q[0], q[1], q[2], q[1], q[4], q[5], q[2], q[5], q[7]};
    double b[3] = {-q[3], -q[6], -q[8]};
    double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                 m[1] * (m[3] * m[8] - m[5] * m[6]) +
                 m[2] * (m[3] * m[7] - m[4] * m[6]);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out->x = inv * (b[0] * (m[4] * m[8] - m[5] * m[7]) -
                    m[1] * (b[1] * m[8] - m[5] * b[2]) +
                    m[2] * (b[1] * m[7] - m[4] * b[2]));
    out->y = inv * (m[0] * (b[1] * m[8] - m[5] * b[2]) -
                    b[0] * (m[3] * m[8] - m[5] * m[6]) +
                    m[2] * (m[3] * b[2] - b[1] * m[6]));
    out->z = inv * (m[0] * (m[4] * b[2] - b[1] * m[7]) -
                    m[1] * (m[3] * b[2] - b[1] * m[6]) +
                    b[0] * (m[3] * m[7] - m[4] * m[6]));
    return true;
  }
};

struct EdgeKey {
  int64_t a, b;
  bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
};
struct EdgeKeyHash {
  size_t operator()(const EdgeKey& e) const {
    return std::hash<int64_t>()(e.a * 1000003 + e.b);
  }
};
EdgeKey mkEdge(int64_t a, int64_t b) {
  return a < b ? EdgeKey{a, b} : EdgeKey{b, a};
}

struct MeshData {
  std::vector<Vec3> verts;
  std::vector<std::array<int64_t, 3>> faces;
};

void compact(MeshData* m) {
  // drop degenerate faces + unreferenced vertices
  std::vector<std::array<int64_t, 3>> keep;
  keep.reserve(m->faces.size());
  for (auto& f : m->faces) {
    if (f[0] != f[1] && f[1] != f[2] && f[0] != f[2]) keep.push_back(f);
  }
  std::vector<int64_t> remap(m->verts.size(), -1);
  std::vector<Vec3> nv;
  for (auto& f : keep) {
    for (auto& vi : f) {
      if (remap[vi] < 0) {
        remap[vi] = (int64_t)nv.size();
        nv.push_back(m->verts[vi]);
      }
      vi = remap[vi];
    }
  }
  m->verts = std::move(nv);
  m->faces = std::move(keep);
}

// --------------------------------------------------------------------------
// Quadric decimation
// --------------------------------------------------------------------------

struct Collapse {
  double cost;
  int64_t va, vb;   // collapse vb into va
  Vec3 target;
  uint64_t stampA, stampB;
  bool operator<(const Collapse& o) const { return cost > o.cost; }  // min-heap
};

void decimate(MeshData* m, int64_t targetFaces) {
  size_t nv = m->verts.size();
  std::vector<Quadric> quadrics(nv);
  for (auto& f : m->faces) {
    Vec3 p0 = m->verts[f[0]], p1 = m->verts[f[1]], p2 = m->verts[f[2]];
    Vec3 n = (p1 - p0).cross(p2 - p0);
    double len = n.norm();
    if (len < 1e-20) continue;
    n = n * (1.0 / len);
    double d = -n.dot(p0);
    for (int i = 0; i < 3; ++i) quadrics[f[i]].addPlane(n.x, n.y, n.z, d);
  }

  // adjacency: vertex -> incident face ids
  std::vector<std::vector<int64_t>> vfaces(nv);
  for (size_t fi = 0; fi < m->faces.size(); ++fi)
    for (int i = 0; i < 3; ++i) vfaces[m->faces[fi][i]].push_back((int64_t)fi);

  std::vector<uint64_t> stamp(nv, 0);
  std::vector<char> faceAlive(m->faces.size(), 1);
  std::vector<int64_t> vertAlias(nv);
  for (size_t i = 0; i < nv; ++i) vertAlias[i] = (int64_t)i;

  auto resolve = [&](int64_t v) {
    while (vertAlias[v] != v) {
      vertAlias[v] = vertAlias[vertAlias[v]];
      v = vertAlias[v];
    }
    return v;
  };

  std::priority_queue<Collapse> heap;
  auto pushEdge = [&](int64_t a, int64_t b) {
    a = resolve(a); b = resolve(b);
    if (a == b) return;
    Quadric q = quadrics[a] + quadrics[b];
    Vec3 t;
    if (!q.optimal(&t)) t = (m->verts[a] + m->verts[b]) * 0.5;
    heap.push({q.eval(t), a, b, t, stamp[a], stamp[b]});
  };

  {
    std::unordered_set<EdgeKey, EdgeKeyHash> seen;
    for (auto& f : m->faces) {
      for (int i = 0; i < 3; ++i) {
        EdgeKey e = mkEdge(f[i], f[(i + 1) % 3]);
        if (seen.insert(e).second) pushEdge(e.a, e.b);
      }
    }
  }

  int64_t liveFaces = (int64_t)m->faces.size();
  while (liveFaces > targetFaces && !heap.empty()) {
    Collapse c = heap.top();
    heap.pop();
    int64_t a = resolve(c.va), b = resolve(c.vb);
    if (a == b) continue;
    if (stamp[a] != c.stampA || stamp[b] != c.stampB) continue;  // stale

    // collapse b -> a at target position
    m->verts[a] = c.target;
    quadrics[a] = quadrics[a] + quadrics[b];
    vertAlias[b] = a;
    ++stamp[a];
    ++stamp[b];

    // merge incident faces; kill degenerates
    std::vector<int64_t> merged;
    merged.reserve(vfaces[a].size() + vfaces[b].size());
    for (int64_t fi : vfaces[a]) if (faceAlive[fi]) merged.push_back(fi);
    for (int64_t fi : vfaces[b]) if (faceAlive[fi]) merged.push_back(fi);
    std::sort(merged.begin(), merged.end());
    merged.erase(std::unique(merged.begin(), merged.end()), merged.end());

    std::unordered_set<int64_t> neighbors;
    std::vector<int64_t> alive;
    for (int64_t fi : merged) {
      auto& f = m->faces[fi];
      int64_t r0 = resolve(f[0]), r1 = resolve(f[1]), r2 = resolve(f[2]);
      if (r0 == r1 || r1 == r2 || r0 == r2) {
        faceAlive[fi] = 0;
        --liveFaces;
      } else {
        f = {r0, r1, r2};
        alive.push_back(fi);
        for (int64_t v : {r0, r1, r2}) if (v != a) neighbors.insert(v);
      }
    }
    vfaces[a] = std::move(alive);
    vfaces[b].clear();

    for (int64_t nvtx : neighbors) pushEdge(a, nvtx);
  }

  std::vector<std::array<int64_t, 3>> out;
  out.reserve(liveFaces);
  for (size_t fi = 0; fi < m->faces.size(); ++fi)
    if (faceAlive[fi]) out.push_back(m->faces[fi]);
  m->faces = std::move(out);
  compact(m);
}

// --------------------------------------------------------------------------
// Isotropic remesh
// --------------------------------------------------------------------------

void splitLongEdges(MeshData* m, double maxLen) {
  std::unordered_map<EdgeKey, int64_t, EdgeKeyHash> midpoint;
  std::vector<std::array<int64_t, 3>> out;
  out.reserve(m->faces.size() * 2);

  auto mid = [&](int64_t a, int64_t b) {
    EdgeKey e = mkEdge(a, b);
    auto it = midpoint.find(e);
    if (it != midpoint.end()) return it->second;
    int64_t idx = (int64_t)m->verts.size();
    m->verts.push_back((m->verts[a] + m->verts[b]) * 0.5);
    midpoint.emplace(e, idx);
    return idx;
  };

  for (auto& f : m->faces) {
    double l01 = (m->verts[f[0]] - m->verts[f[1]]).norm();
    double l12 = (m->verts[f[1]] - m->verts[f[2]]).norm();
    double l20 = (m->verts[f[2]] - m->verts[f[0]]).norm();
    int splitMask = (l01 > maxLen) | ((l12 > maxLen) << 1) |
                    ((l20 > maxLen) << 2);
    if (!splitMask) {
      out.push_back(f);
      continue;
    }
    int nsplit = (splitMask & 1) + ((splitMask >> 1) & 1) +
                 ((splitMask >> 2) & 1);
    if (nsplit == 3) {
      // full 1->4 subdivision
      int64_t mAB = mid(f[0], f[1]), mBC = mid(f[1], f[2]),
              mCA = mid(f[2], f[0]);
      out.push_back({f[0], mAB, mCA});
      out.push_back({mAB, f[1], mBC});
      out.push_back({mCA, mBC, f[2]});
      out.push_back({mAB, mBC, mCA});
    } else if (nsplit == 2) {
      // rotate so the NOT-split edge is (c, a): 1->3
      int which = (splitMask == 3) ? 0 : (splitMask == 6 ? 1 : 2);
      int64_t a = f[which], b = f[(which + 1) % 3], c = f[(which + 2) % 3];
      int64_t mAB = mid(a, b), mBC = mid(b, c);
      out.push_back({a, mAB, mBC});
      out.push_back({mAB, b, mBC});
      out.push_back({a, mBC, c});
    } else {
      // rotate so the split edge is (a, b): 1->2
      int which = (splitMask & 1) ? 0 : ((splitMask & 2) ? 1 : 2);
      int64_t a = f[which], b = f[(which + 1) % 3], c = f[(which + 2) % 3];
      int64_t mAB = mid(a, b);
      out.push_back({a, mAB, c});
      out.push_back({mAB, b, c});
    }
  }
  m->faces = std::move(out);
}

void collapseShortEdges(MeshData* m, double minLen, double maxLen) {
  std::vector<int64_t> alias(m->verts.size());
  for (size_t i = 0; i < alias.size(); ++i) alias[i] = (int64_t)i;
  // one collapse per vertex per pass: without this guard, chains of
  // short edges cascade through the stale adjacency snapshot and whole
  // regions collapse to a point (observed: repeated remesh calls shrank
  // 384 -> 162 -> 8 -> 0 faces)
  std::vector<char> touched(m->verts.size(), 0);
  auto resolve = [&](int64_t v) {
    while (alias[v] != v) {
      alias[v] = alias[alias[v]];
      v = alias[v];
    }
    return v;
  };

  // vertex adjacency for the "won't create long edges" check
  std::vector<std::vector<int64_t>> vadj(m->verts.size());
  for (auto& f : m->faces)
    for (int i = 0; i < 3; ++i) {
      vadj[f[i]].push_back(f[(i + 1) % 3]);
      vadj[f[i]].push_back(f[(i + 2) % 3]);
    }

  for (auto& f : m->faces) {
    for (int i = 0; i < 3; ++i) {
      int64_t a = resolve(f[i]), b = resolve(f[(i + 1) % 3]);
      if (a == b) continue;
      if (touched[a] || touched[b]) continue;
      if ((m->verts[a] - m->verts[b]).norm() >= minLen) continue;
      Vec3 target = (m->verts[a] + m->verts[b]) * 0.5;
      bool ok = true;
      for (int64_t n : vadj[a]) {
        if ((m->verts[resolve(n)] - target).norm() > maxLen) { ok = false; break; }
      }
      if (ok) {
        for (int64_t n : vadj[b]) {
          if ((m->verts[resolve(n)] - target).norm() > maxLen) { ok = false; break; }
        }
      }
      if (!ok) continue;
      m->verts[a] = target;
      alias[b] = a;
      touched[a] = touched[b] = 1;
      vadj[a].insert(vadj[a].end(), vadj[b].begin(), vadj[b].end());
    }
  }
  for (auto& f : m->faces)
    for (auto& v : f) v = resolve(v);
  compact(m);
}

void flipForValence(MeshData* m) {
  // target valence 6 (interior); flip shared edges when it reduces excess
  std::vector<int> valence(m->verts.size(), 0);
  for (auto& f : m->faces)
    for (auto v : f) valence[v]++;

  std::unordered_map<EdgeKey, std::vector<int64_t>, EdgeKeyHash> edgeFaces;
  for (size_t fi = 0; fi < m->faces.size(); ++fi)
    for (int i = 0; i < 3; ++i)
      edgeFaces[mkEdge(m->faces[fi][i], m->faces[fi][(i + 1) % 3])]
          .push_back((int64_t)fi);

  auto opposite = [&](int64_t fi, int64_t a, int64_t b) -> int64_t {
    for (auto v : m->faces[fi])
      if (v != a && v != b) return v;
    return -1;
  };

  for (auto& [edge, fs] : edgeFaces) {
    if (fs.size() != 2) continue;
    int64_t a = edge.a, b = edge.b;
    int64_t c = opposite(fs[0], a, b), d = opposite(fs[1], a, b);
    if (c < 0 || d < 0 || c == d) continue;
    auto dev = [&](int64_t v, int delta) {
      return std::abs(valence[v] + delta - 6);
    };
    int before = dev(a, 0) + dev(b, 0) + dev(c, 0) + dev(d, 0);
    int after = dev(a, -1) + dev(b, -1) + dev(c, 1) + dev(d, 1);
    if (after >= before) continue;
    // geometric sanity: skip flips that would invert normals badly
    Vec3 n1 = (m->verts[b] - m->verts[a]).cross(m->verts[c] - m->verts[a]);
    Vec3 n2 = (m->verts[d] - m->verts[a]).cross(m->verts[b] - m->verts[a]);
    if (n1.dot(n2) <= 0) continue;
    m->faces[fs[0]] = {a, d, c};
    m->faces[fs[1]] = {b, c, d};
    valence[a]--; valence[b]--; valence[c]++; valence[d]++;
    // edgeFaces is now stale for these faces; acceptable per-pass
  }
}

// closest point on triangle abc to p (Ericson, Real-Time Collision
// Detection §5.1.5)
Vec3 closestOnTriangle(const Vec3& p, const Vec3& a, const Vec3& b,
                       const Vec3& c) {
  Vec3 ab = b - a, ac = c - a, ap = p - a;
  double d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return a;
  Vec3 bp = p - b;
  double d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return b;
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    return a + ab * v;
  }
  Vec3 cp = p - c;
  double d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return c;
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    return a + ac * w;
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return b + (c - b) * w;
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  return a + ab * v + ac * w;
}

// project every vertex back onto the ORIGINAL surface — without this the
// tangential relaxation shrinks the shape each iteration (classic
// Laplacian shrinkage; pymeshlab's isotropic remesh reprojects too)
void projectToSurface(MeshData* m, const std::vector<Vec3>& origV,
                      const std::vector<std::array<int64_t, 3>>& origF) {
  // per-triangle bounding spheres for a cheap reject
  std::vector<Vec3> center(origF.size());
  std::vector<double> radius(origF.size());
  for (size_t i = 0; i < origF.size(); ++i) {
    const Vec3& a = origV[origF[i][0]];
    const Vec3& b = origV[origF[i][1]];
    const Vec3& c = origV[origF[i][2]];
    Vec3 ctr = (a + b + c) * (1.0 / 3.0);
    double r = std::max({(a - ctr).norm(), (b - ctr).norm(),
                         (c - ctr).norm()});
    center[i] = ctr;
    radius[i] = r;
  }
  for (auto& p : m->verts) {
    double best = 1e300;
    Vec3 bestP = p;
    for (size_t i = 0; i < origF.size(); ++i) {
      double lower = (center[i] - p).norm() - radius[i];
      if (lower * lower >= best && lower > 0) continue;
      Vec3 q = closestOnTriangle(p, origV[origF[i][0]],
                                 origV[origF[i][1]], origV[origF[i][2]]);
      double d = (q - p).dot(q - p);
      if (d < best) {
        best = d;
        bestP = q;
      }
    }
    p = bestP;
  }
}

void tangentialRelax(MeshData* m, double lambda) {
  std::vector<Vec3> centroid(m->verts.size());
  std::vector<double> weight(m->verts.size(), 0);
  for (auto& f : m->faces)
    for (int i = 0; i < 3; ++i) {
      int64_t v = f[i];
      centroid[v] = centroid[v] + m->verts[f[(i + 1) % 3]] +
                    m->verts[f[(i + 2) % 3]];
      weight[v] += 2;
    }
  // vertex normals for tangential projection
  std::vector<Vec3> vnormal(m->verts.size());
  for (auto& f : m->faces) {
    Vec3 n = (m->verts[f[1]] - m->verts[f[0]])
                 .cross(m->verts[f[2]] - m->verts[f[0]]);
    for (auto v : f) vnormal[v] = vnormal[v] + n;
  }
  for (size_t v = 0; v < m->verts.size(); ++v) {
    if (weight[v] <= 0) continue;
    Vec3 c = centroid[v] * (1.0 / weight[v]);
    Vec3 d = c - m->verts[v];
    double nn = vnormal[v].norm();
    if (nn > 1e-20) {
      Vec3 n = vnormal[v] * (1.0 / nn);
      d = d - n * d.dot(n);  // tangential component only
    }
    m->verts[v] = m->verts[v] + d * lambda;
  }
}

}  // namespace

extern "C" {

int meshops_decimate(const double* verts, int nv, const int64_t* faces,
                     int nf, int target_faces, double* out_verts,
                     int64_t* out_faces, int* out_nv, int* out_nf) {
  if (nv <= 0 || nf <= 0 || target_faces <= 0) return 1;
  MeshData m;
  m.verts.resize(nv);
  std::memcpy(m.verts.data(), verts, sizeof(double) * 3 * nv);
  m.faces.resize(nf);
  std::memcpy(m.faces.data(), faces, sizeof(int64_t) * 3 * nf);

  decimate(&m, target_faces);

  if ((int)m.verts.size() > nv || (int)m.faces.size() > nf) return 2;
  std::memcpy(out_verts, m.verts.data(), sizeof(double) * 3 * m.verts.size());
  std::memcpy(out_faces, m.faces.data(), sizeof(int64_t) * 3 * m.faces.size());
  *out_nv = (int)m.verts.size();
  *out_nf = (int)m.faces.size();
  return 0;
}

int meshops_isotropic_remesh(const double* verts, int nv,
                             const int64_t* faces, int nf,
                             double target_edge_len, int iterations,
                             double* out_verts, int64_t* out_faces,
                             int* out_nv, int* out_nf, int capacity_verts,
                             int capacity_faces) {
  if (nv <= 0 || nf <= 0 || target_edge_len <= 0) return 1;
  MeshData m;
  m.verts.resize(nv);
  std::memcpy(m.verts.data(), verts, sizeof(double) * 3 * nv);
  m.faces.resize(nf);
  std::memcpy(m.faces.data(), faces, sizeof(int64_t) * 3 * nf);

  const std::vector<Vec3> origV = m.verts;
  const std::vector<std::array<int64_t, 3>> origF = m.faces;

  // Once the edge-length distribution straddles the collapse threshold,
  // further passes erode the mesh (collapse removes more than split
  // re-adds on sharp-featured inputs).  Track the densest state reached
  // and restore it if an iteration starts destroying faces.
  MeshData best;
  size_t bestCount = 0;
  for (int it = 0; it < iterations; ++it) {
    splitLongEdges(&m, target_edge_len * 4.0 / 3.0);
    collapseShortEdges(&m, target_edge_len * 4.0 / 5.0,
                       target_edge_len * 4.0 / 3.0);
    flipForValence(&m);
    tangentialRelax(&m, 0.5);
    projectToSurface(&m, origV, origF);
    if ((int)m.faces.size() > capacity_faces) return 2;
    if (m.faces.size() >= bestCount) {
      bestCount = m.faces.size();
      best = m;
    } else if (m.faces.size() < bestCount * 9 / 10) {
      m = best;
      break;
    }
  }
  compact(&m);

  if ((int)m.faces.size() > capacity_faces) return 2;
  if ((int)m.verts.size() > capacity_verts) return 2;
  std::memcpy(out_verts, m.verts.data(), sizeof(double) * 3 * m.verts.size());
  std::memcpy(out_faces, m.faces.data(), sizeof(int64_t) * 3 * m.faces.size());
  *out_nv = (int)m.verts.size();
  *out_nf = (int)m.faces.size();
  return 0;
}

}  // extern "C"
