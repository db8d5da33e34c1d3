// slamviz — native software point-cloud viewer for slam_rgbd_tpu.
//
// The native-viewer capability of the reference, re-built headless
// (SURVEY.md §2 C6 + C10): the reference renders a colored 3D point cloud
// with immediate-mode OpenGL — per-pixel back-projection at
// `Youth.Source/ViewerModule/viewerModule.c:336-357` (its hottest loop),
// mouse-drag orbit (`viewerModule.c:416-428`), scroll zoom x1.1/x0.9
// (`viewerModule.c:431-440`) — and `src/Viewer/Viewer.cpp` is a modern
// RAII rewrite of the same. This module keeps that capability without a
// GL stack: a z-buffered perspective splatting rasterizer with the same
// orbit/zoom camera semantics, rendering into a caller-owned RGB8 buffer
// (servable by the web viewer or written as PPM). Pure C++17, C ABI,
// consumed via ctypes from `slam_rgbd_tpu/viz/native.py`.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Viewer {
  int width = 960;
  int height = 720;
  float fov_deg = 45.0f;  // reference: 45-degree perspective,
                          // viewerModule.c:443-452
  // Orbit camera state (reference mouse semantics).
  float yaw = 0.0f;    // radians, drag-x
  float pitch = 0.0f;  // radians, drag-y
  float dist = 2.0f;   // metres from target
  float target[3] = {0.0f, 0.0f, 1.5f};
  int point_px = 2;  // splat size
  uint8_t bg[3] = {11, 14, 20};
  std::vector<float> zbuf;
};

inline void rotate_yaw_pitch(const Viewer& v, const float p[3], float out[3]) {
  // world -> camera: translate to target, yaw about Y, pitch about X,
  // back off by dist along +Z (camera looks down +Z like the pipeline).
  float x = p[0] - v.target[0];
  float y = p[1] - v.target[1];
  float z = p[2] - v.target[2];
  float cy = std::cos(v.yaw), sy = std::sin(v.yaw);
  float x1 = cy * x + sy * z;
  float z1 = -sy * x + cy * z;
  float cp = std::cos(v.pitch), sp = std::sin(v.pitch);
  float y2 = cp * y - sp * z1;
  float z2 = sp * y + cp * z1;
  out[0] = x1;
  out[1] = y2;
  out[2] = z2 + v.dist;
}

}  // namespace

extern "C" {

Viewer* viewer_create(int width, int height) {
  Viewer* v = new Viewer();
  v->width = width;
  v->height = height;
  v->zbuf.resize(static_cast<size_t>(width) * height);
  return v;
}

void viewer_destroy(Viewer* v) { delete v; }

// Mouse-drag orbit: 0.01 rad/px, pitch clamped — viewerModule.c:416-428.
void viewer_orbit(Viewer* v, float dx_px, float dy_px) {
  v->yaw += 0.01f * dx_px;
  v->pitch += 0.01f * dy_px;
  v->pitch = std::max(-1.55f, std::min(1.55f, v->pitch));
}

// Scroll zoom: x0.9 in / x1.1 out per step — viewerModule.c:431-440.
void viewer_zoom(Viewer* v, int steps) {
  for (int i = 0; i < steps; i++) v->dist *= 0.9f;
  for (int i = 0; i > steps; i--) v->dist *= 1.1f;
  v->dist = std::max(0.05f, std::min(100.0f, v->dist));
}

void viewer_set_target(Viewer* v, float x, float y, float z) {
  v->target[0] = x;
  v->target[1] = y;
  v->target[2] = z;
}

void viewer_set_point_size(Viewer* v, int px) {
  v->point_px = std::max(1, std::min(8, px));
}

// Back-project an RGB-D frame into world-frame points under pose T (4x4,
// row-major camera-to-world) — the native batch version of the
// reference's per-pixel loop (viewerModule.c:336-357: z = mm/1000,
// x = (u - cx) z / fx, y = (v - cy) z / fy). Returns the point count.
int64_t viewer_backproject(const uint16_t* depth_mm, const uint8_t* rgb,
                           int w, int h, float fx, float fy, float cx,
                           float cy, const float* T_cw, float* out_xyz,
                           uint8_t* out_rgb) {
  int64_t n = 0;
  for (int vv = 0; vv < h; vv++) {
    for (int uu = 0; uu < w; uu++) {
      uint16_t d = depth_mm[static_cast<size_t>(vv) * w + uu];
      if (d == 0) continue;
      float z = d * 1e-3f;
      float x = (uu - cx) * z / fx;
      float y = (vv - cy) * z / fy;
      float wx = x, wy = y, wz = z;
      if (T_cw != nullptr) {
        wx = T_cw[0] * x + T_cw[1] * y + T_cw[2] * z + T_cw[3];
        wy = T_cw[4] * x + T_cw[5] * y + T_cw[6] * z + T_cw[7];
        wz = T_cw[8] * x + T_cw[9] * y + T_cw[10] * z + T_cw[11];
      }
      out_xyz[3 * n + 0] = wx;
      out_xyz[3 * n + 1] = wy;
      out_xyz[3 * n + 2] = wz;
      const uint8_t* c = rgb + (static_cast<size_t>(vv) * w + uu) * 3;
      out_rgb[3 * n + 0] = c[0];
      out_rgb[3 * n + 1] = c[1];
      out_rgb[3 * n + 2] = c[2];
      n++;
    }
  }
  return n;
}

// Z-buffered perspective splatting of n points into a caller-owned
// RGB8 framebuffer (height x width x 3).
void viewer_render(Viewer* v, const float* xyz, const uint8_t* rgb,
                   int64_t n, uint8_t* out) {
  const int W = v->width, H = v->height;
  const float f = 0.5f * H / std::tan(0.5f * v->fov_deg * 3.14159265f / 180.f);
  std::fill(v->zbuf.begin(), v->zbuf.end(),
            std::numeric_limits<float>::infinity());
  for (int i = 0; i < H * W; i++) {
    out[3 * i + 0] = v->bg[0];
    out[3 * i + 1] = v->bg[1];
    out[3 * i + 2] = v->bg[2];
  }
  const int r = v->point_px / 2;
  for (int64_t i = 0; i < n; i++) {
    float pc[3];
    rotate_yaw_pitch(*v, xyz + 3 * i, pc);
    if (pc[2] <= 0.01f) continue;
    float inv_z = 1.0f / pc[2];
    int u = static_cast<int>(f * pc[0] * inv_z + 0.5f * W);
    int uvv = static_cast<int>(f * pc[1] * inv_z + 0.5f * H);
    for (int dv = -r; dv <= r; dv++) {
      int y = uvv + dv;
      if (y < 0 || y >= H) continue;
      for (int du = -r; du <= r; du++) {
        int x = u + du;
        if (x < 0 || x >= W) continue;
        size_t idx = static_cast<size_t>(y) * W + x;
        if (pc[2] < v->zbuf[idx]) {
          v->zbuf[idx] = pc[2];
          out[3 * idx + 0] = rgb[3 * i + 0];
          out[3 * idx + 1] = rgb[3 * i + 1];
          out[3 * idx + 2] = rgb[3 * i + 2];
        }
      }
    }
  }
}

int viewer_write_ppm(const char* path, const uint8_t* rgb, int w, int h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  size_t want = static_cast<size_t>(w) * h * 3;
  size_t got = std::fwrite(rgb, 1, want, f);
  std::fclose(f);
  return got == want ? 0 : -1;
}

}  // extern "C"
