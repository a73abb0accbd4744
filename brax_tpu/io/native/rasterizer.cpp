// Software triangle rasterizer for trajectory rendering on the host CPU.
//
// Role parity with the reference's pytinyrenderer C++ dependency
// (/root/reference/brax/io/image.py:20,58-217 wraps it); written from
// scratch: perspective camera, edge-function rasterization with a z-buffer,
// per-face lambert + hemisphere shading, gamma-corrected 8-bit output.
//
// Built on demand by brax_tpu/io/native/__init__.py (g++ -O3 -shared) and
// called through ctypes; the jitted SDF ray-marcher remains the on-device
// path, this is the fast host path for GIF/preview rendering.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 normalize(Vec3 v) {
  float l = std::sqrt(dot(v, v));
  if (l < 1e-12f) return {0, 0, 1};
  return {v.x / l, v.y / l, v.z / l};
}

}  // namespace

extern "C" {

// verts:      n_verts * 3 floats, world space
// tris:       n_tris * 3 int32 vertex indices
// tri_colors: n_tris * 3 floats, linear RGB in [0, 1]
// view:       4x4 row-major world->camera (camera looks down -z)
// fov_y:      vertical field of view in radians
// out_rgb:    height * width * 3 bytes (row 0 = top)
void rasterize(const float* verts, int n_verts, const int32_t* tris,
               const float* tri_colors, int n_tris, const float* view,
               float fov_y, int width, int height, float sky_r, float sky_g,
               float sky_b, uint8_t* out_rgb) {
  const float f = 1.0f / std::tan(fov_y * 0.5f);
  const float aspect = static_cast<float>(width) / height;
  const float znear = 0.01f;

  // camera-space positions
  std::vector<Vec3> cam(n_verts);
  for (int i = 0; i < n_verts; ++i) {
    const float* p = verts + 3 * i;
    for (int r = 0; r < 3; ++r) {
      (&cam[i].x)[r] = view[4 * r + 0] * p[0] + view[4 * r + 1] * p[1] +
                       view[4 * r + 2] * p[2] + view[4 * r + 3];
    }
  }

  std::vector<float> zbuf(static_cast<size_t>(width) * height, -1e30f);
  // sky fill (gamma-corrected once at the end, so store linear now)
  std::vector<Vec3> color(static_cast<size_t>(width) * height,
                          Vec3{sky_r, sky_g, sky_b});
  std::vector<uint8_t> lit(static_cast<size_t>(width) * height, 0);

  const Vec3 light = normalize({0.35f, 0.5f, 0.8f});

  for (int t = 0; t < n_tris; ++t) {
    const Vec3 a = cam[tris[3 * t]];
    const Vec3 b = cam[tris[3 * t + 1]];
    const Vec3 c = cam[tris[3 * t + 2]];
    // all three behind the near plane -> skip (no clipping: a vertex just in
    // front projects correctly; partial near-plane crossings are rare in
    // these scenes and simply dropped)
    if (a.z > -znear || b.z > -znear || c.z > -znear) continue;

    // screen-space (pixel) coordinates, perspective divide
    auto to_screen = [&](Vec3 p) {
      float inv = -1.0f / p.z;
      return Vec3{(p.x * f / aspect * inv * 0.5f + 0.5f) * width,
                  (0.5f - p.y * f * inv * 0.5f) * height, inv};  // z = 1/depth
    };
    Vec3 sa = to_screen(a), sb = to_screen(b), sc = to_screen(c);

    float area = (sb.x - sa.x) * (sc.y - sa.y) - (sb.y - sa.y) * (sc.x - sa.x);
    if (std::fabs(area) < 1e-9f) continue;

    // camera-space face normal, flipped toward the camera (two-sided)
    Vec3 n = normalize(cross(sub(b, a), sub(c, a)));
    Vec3 center{(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                (a.z + b.z + c.z) / 3};
    if (dot(n, center) > 0) n = {-n.x, -n.y, -n.z};

    // shading is constant per face: lambert + hemisphere (camera-space
    // light; the view matrix is rigid so this matches world-space shading)
    float lam = dot(n, light);
    if (lam < 0) lam = 0;
    float hemi = 0.5f + 0.5f * n.y;  // camera up
    float shade = 0.35f * hemi + 0.75f * lam;
    const float* col = tri_colors + 3 * t;
    Vec3 shaded{col[0] * shade, col[1] * shade, col[2] * shade};

    int x0 = std::max(0, (int)std::floor(std::fmin(sa.x, std::fmin(sb.x, sc.x))));
    int x1 = std::min(width - 1, (int)std::ceil(std::fmax(sa.x, std::fmax(sb.x, sc.x))));
    int y0 = std::max(0, (int)std::floor(std::fmin(sa.y, std::fmin(sb.y, sc.y))));
    int y1 = std::min(height - 1, (int)std::ceil(std::fmax(sa.y, std::fmax(sb.y, sc.y))));

    const float inv_area = 1.0f / area;
    for (int y = y0; y <= y1; ++y) {
      for (int x = x0; x <= x1; ++x) {
        float px = x + 0.5f, py = y + 0.5f;
        float w0 = ((sb.x - sa.x) * (py - sa.y) - (sb.y - sa.y) * (px - sa.x)) * inv_area;
        float w1 = ((sc.x - sb.x) * (py - sb.y) - (sc.y - sb.y) * (px - sb.x)) * inv_area;
        float w2 = ((sa.x - sc.x) * (py - sc.y) - (sa.y - sc.y) * (px - sc.x)) * inv_area;
        // inside test robust to either winding
        if ((w0 < 0 || w1 < 0 || w2 < 0) && (w0 > 0 || w1 > 0 || w2 > 0))
          continue;
        // perspective-correct-enough depth: interpolate 1/z linearly in
        // screen space (exact for 1/z)
        float invz = w1 * sa.z + w2 * sb.z + w0 * sc.z;
        size_t idx = static_cast<size_t>(y) * width + x;
        if (invz > zbuf[idx]) {
          zbuf[idx] = invz;
          color[idx] = shaded;
          lit[idx] = 1;
        }
      }
    }
  }

  for (size_t i = 0; i < color.size(); ++i) {
    float g = 1.0f / 2.2f;
    Vec3 cpx = color[i];
    float rr = lit[i] ? std::pow(std::fmin(std::fmax(cpx.x, 0.f), 1.f), g) : cpx.x;
    float gg = lit[i] ? std::pow(std::fmin(std::fmax(cpx.y, 0.f), 1.f), g) : cpx.y;
    float bb = lit[i] ? std::pow(std::fmin(std::fmax(cpx.z, 0.f), 1.f), g) : cpx.z;
    out_rgb[3 * i + 0] = (uint8_t)(rr * 255.0f + 0.5f);
    out_rgb[3 * i + 1] = (uint8_t)(gg * 255.0f + 0.5f);
    out_rgb[3 * i + 2] = (uint8_t)(bb * 255.0f + 0.5f);
  }
}

}  // extern "C"
