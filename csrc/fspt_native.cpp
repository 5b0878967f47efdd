// fspt_tpu native host-side runtime components.
//
// The reference implements its entire runtime in C++; the TPU framework's
// device path is JAX/XLA/Pallas, but the host-side heavy lifting — BVH
// construction over large meshes and OBJ parsing — is native here too
// (NumPy fallbacks exist in fspt_tpu/ops/bvh.py and fspt_tpu/scene/mesh.py
// and tests assert both produce identical results).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// BVH: median-split on the longest centroid axis, emitted in pre-order with
// miss links — semantics identical to _build_bvh_preorder (ops/bvh.py),
// which itself re-designs the reference's recursive octree Subdivide
// (reference bvh.h:109-137, scene.cpp:33-73) as a flat tensor layout.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BVH builder

struct BuildCtx {
  const float* tmin;      // [n,3]
  const float* tmax;      // [n,3]
  const float* centroid;  // [n,3]
  int max_leaf;
  // outputs (preallocated worst-case 2n rows by the caller)
  int64_t* order;
  float* bmin;
  float* bmax;
  int64_t* first;
  int64_t* count;
  int64_t* miss;
  int64_t n_nodes;
  int64_t n_emitted_tris;
};

static int64_t emit(BuildCtx* ctx, std::vector<int64_t>& idx, int64_t lo,
                    int64_t hi, int64_t miss_target) {
  const int64_t slot = ctx->n_nodes++;
  float bmn[3] = {3e38f, 3e38f, 3e38f};
  float bmx[3] = {-3e38f, -3e38f, -3e38f};
  for (int64_t i = lo; i < hi; i++) {
    const float* a = ctx->tmin + idx[i] * 3;
    const float* b = ctx->tmax + idx[i] * 3;
    for (int k = 0; k < 3; k++) {
      bmn[k] = std::min(bmn[k], a[k]);
      bmx[k] = std::max(bmx[k], b[k]);
    }
  }
  for (int k = 0; k < 3; k++) {
    ctx->bmin[slot * 3 + k] = bmn[k];
    ctx->bmax[slot * 3 + k] = bmx[k];
  }
  ctx->first[slot] = 0;
  ctx->count[slot] = 0;
  ctx->miss[slot] = miss_target;  // -1 == patch/DONE sentinel, fixed later

  const int64_t n = hi - lo;
  if (n <= ctx->max_leaf) {
    ctx->first[slot] = ctx->n_emitted_tris;
    ctx->count[slot] = n;
    for (int64_t i = lo; i < hi; i++) ctx->order[ctx->n_emitted_tris++] = idx[i];
    return slot;
  }

  int axis = 0;
  float ext = bmx[0] - bmn[0];
  for (int k = 1; k < 3; k++) {
    const float e = bmx[k] - bmn[k];
    if (e > ext) {  // strict >: first-max ties like np.argmax
      ext = e;
      axis = k;
    }
  }
  const float* cen = ctx->centroid;
  std::stable_sort(idx.begin() + lo, idx.begin() + hi,
                   [cen, axis](int64_t a, int64_t b) {
                     return cen[a * 3 + axis] < cen[b * 3 + axis];
                   });
  const int64_t half = n / 2;

  // Left subtree: miss target unknown until emitted; use -2 and patch.
  const int64_t left_root = emit(ctx, idx, lo, lo + half, -2);
  const int64_t right_root = ctx->n_nodes;
  for (int64_t i = left_root; i < right_root; i++)
    if (ctx->miss[i] == -2) ctx->miss[i] = right_root;
  emit(ctx, idx, lo + half, hi, miss_target);
  return slot;
}

// Returns the node count M (arrays are filled for rows [0, M)).
int64_t fspt_build_bvh(const float* v0, const float* v1, const float* v2,
                       int64_t n, int64_t max_leaf, int64_t* order,
                       float* bmin, float* bmax, int64_t* first,
                       int64_t* count, int64_t* miss) {
  std::vector<float> tmin(n * 3), tmax(n * 3), centroid(n * 3);
  for (int64_t i = 0; i < n * 3; i++) {
    const float a = v0[i], b = v1[i], c = v2[i];
    const float mn = std::min(a, std::min(b, c));
    const float mx = std::max(a, std::max(b, c));
    tmin[i] = mn;
    tmax[i] = mx;
    centroid[i] = (mn + mx) * 0.5f;
  }
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; i++) idx[i] = i;

  BuildCtx ctx;
  ctx.tmin = tmin.data();
  ctx.tmax = tmax.data();
  ctx.centroid = centroid.data();
  ctx.max_leaf = static_cast<int>(max_leaf);
  ctx.order = order;
  ctx.bmin = bmin;
  ctx.bmax = bmax;
  ctx.first = first;
  ctx.count = count;
  ctx.miss = miss;
  ctx.n_nodes = 0;
  ctx.n_emitted_tris = 0;
  emit(&ctx, idx, 0, n, -1);
  for (int64_t i = 0; i < ctx.n_nodes; i++)
    if (miss[i] < 0) miss[i] = ctx.n_nodes;  // DONE sentinel → exit index
  return ctx.n_nodes;
}

// ---------------------------------------------------------------------------
// OBJ parser (counts pass + fill pass; replaces vendored tinyobjloader —
// reference mesh.cpp:8-9, 177-182 — with the same fan triangulation and
// 1-based/negative index resolution).

struct ObjCounts {
  int64_t n_verts;
  int64_t n_normals;
  int64_t n_texcoords;
  int64_t n_tris;
};

static bool read_file(const char* path, std::vector<char>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  const long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size + 1);
  const size_t got = fread(out->data(), 1, size, f);
  fclose(f);
  out->resize(got);
  out->push_back('\0');
  return true;
}

int fspt_obj_count(const char* path, ObjCounts* counts) {
  std::vector<char> buf;
  if (!read_file(path, &buf)) return -1;
  memset(counts, 0, sizeof(*counts));
  const char* p = buf.data();
  while (*p) {
    while (*p == ' ' || *p == '\t') p++;
    if (p[0] == 'v' && p[1] == ' ')
      counts->n_verts++;
    else if (p[0] == 'v' && p[1] == 'n' && p[2] == ' ')
      counts->n_normals++;
    else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ')
      counts->n_texcoords++;
    else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      int corners = 0;
      const char* q = p + 1;
      while (*q && *q != '\n') {
        while (*q == ' ' || *q == '\t') q++;
        if (*q && *q != '\n' && *q != '\r') {
          corners++;
          while (*q && *q != ' ' && *q != '\t' && *q != '\n') q++;
        }
      }
      if (corners >= 3) counts->n_tris += corners - 2;
    }
    while (*p && *p != '\n') p++;
    if (*p) p++;
  }
  return 0;
}

// Fills caller-allocated arrays; faces as (vi,ti,ni) triples per corner,
// -1 where absent. Returns 0 on success.
int fspt_obj_parse(const char* path, float* verts, float* normals,
                   float* texcoords, int64_t* faces) {
  std::vector<char> buf;
  if (!read_file(path, &buf)) return -1;
  char* p = buf.data();
  int64_t nv = 0, nn = 0, nt = 0, nf = 0;

  auto parse_floats = [&](char* q, float* dst, int want) {
    for (int k = 0; k < want; k++) {
      while (*q == ' ' || *q == '\t') q++;
      dst[k] = strtof(q, &q);
    }
  };

  while (*p) {
    while (*p == ' ' || *p == '\t') p++;
    if (p[0] == 'v' && p[1] == ' ') {
      parse_floats(p + 1, verts + nv * 3, 3);
      nv++;
    } else if (p[0] == 'v' && p[1] == 'n' && p[2] == ' ') {
      parse_floats(p + 2, normals + nn * 3, 3);
      nn++;
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      float uv[2] = {0, 0};
      parse_floats(p + 2, uv, 2);
      texcoords[nt * 2] = uv[0];
      texcoords[nt * 2 + 1] = uv[1];
      nt++;
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      int64_t corner[64][3];
      int n_corner = 0;
      char* q = p + 1;
      while (*q && *q != '\n' && n_corner < 64) {
        while (*q == ' ' || *q == '\t') q++;
        if (!*q || *q == '\n' || *q == '\r') break;
        int64_t vi = strtoll(q, &q, 10);
        int64_t ti = 0, ni = 0;
        // strtoll skips leading whitespace, which would swallow the next
        // corner for empty specs like "v//"; only parse if a number starts
        // immediately.
        auto starts_num = [](char c) {
          return (c >= '0' && c <= '9') || c == '-' || c == '+';
        };
        if (*q == '/') {
          q++;
          if (starts_num(*q)) ti = strtoll(q, &q, 10);
          if (*q == '/') {
            q++;
            if (starts_num(*q)) ni = strtoll(q, &q, 10);
          }
        }
        corner[n_corner][0] = vi > 0 ? vi - 1 : nv + vi;
        corner[n_corner][1] = ti > 0 ? ti - 1 : (ti ? nt + ti : -1);
        corner[n_corner][2] = ni > 0 ? ni - 1 : (ni ? nn + ni : -1);
        n_corner++;
        while (*q && *q != ' ' && *q != '\t' && *q != '\n') q++;
      }
      for (int k = 1; k < n_corner - 1; k++) {  // fan triangulation
        int64_t* dst = faces + nf * 9;
        for (int c = 0; c < 3; c++) {
          const int64_t* src = corner[c == 0 ? 0 : (c == 1 ? k : k + 1)];
          dst[c * 3 + 0] = src[0];
          dst[c * 3 + 1] = src[1];
          dst[c * 3 + 2] = src[2];
        }
        nf++;
      }
    }
    while (*p && *p != '\n') p++;
    if (*p) p++;
  }
  return 0;
}

}  // extern "C"
