// Native ray-buffer builder.
//
// The reference's datasets precompute every training ray in Python
// (minutes of startup for LLFF HR scenes — SURVEY.md §3.1 "startup hot
// spot"). This C++ core builds the per-image ray buffers (camera-space
// directions -> world rays -> optional NDC warp) multithreaded, exposed
// to Python through ctypes (nerfsr_tpu/native/__init__.py) with a numpy
// fallback when the shared library hasn't been built.
//
// Build: tools/build_native.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Mat34 {
  // row-major 3x4 camera-to-world
  const float* m;
  inline void rotate(const float v[3], float out[3]) const {
    out[0] = m[0] * v[0] + m[1] * v[1] + m[2] * v[2];
    out[1] = m[4] * v[0] + m[5] * v[1] + m[6] * v[2];
    out[2] = m[8] * v[0] + m[9] * v[1] + m[10] * v[2];
  }
};

inline void ndc_warp(int h, int w, float focal, float near, float ox,
                     float oy, float oz, float dx, float dy, float dz,
                     float* o_out, float* d_out) {
  // parity with models/utils.py:155-196 (see core/rays.py ndc_rays)
  float t = -(near + oz) / dz;
  ox += t * dx;
  oy += t * dy;
  oz += t * dz;
  float ox_oz = ox / oz;
  float oy_oz = oy / oz;
  float sx = -1.0f / (w / (2.0f * focal));
  float sy = -1.0f / (h / (2.0f * focal));
  float o0 = sx * ox_oz;
  float o1 = sy * oy_oz;
  float o2 = 1.0f + 2.0f * near / oz;
  float d0 = sx * (dx / dz - ox_oz);
  float d1 = sy * (dy / dz - oy_oz);
  float d2 = 1.0f - o2;
  o_out[0] = o0;
  o_out[1] = o1;
  o_out[2] = o2;
  d_out[0] = d0;
  d_out[1] = d1;
  d_out[2] = d2;
}

void build_image_rays(const float* c2w_all, int img, int h, int w,
                      float focal, float pixel_center, int apply_ndc,
                      float ndc_near, float* origins, float* dirs) {
  Mat34 c2w{c2w_all + img * 12};
  const float cx = c2w.m[3], cy = c2w.m[7], cz = c2w.m[11];
  const float half_w = w / 2.0f, half_h = h / 2.0f;
  float* o_img = origins + (int64_t)img * h * w * 3;
  float* d_img = dirs + (int64_t)img * h * w * 3;
  for (int j = 0; j < h; ++j) {
    for (int i = 0; i < w; ++i) {
      float cam[3] = {((float)i + pixel_center - half_w) / focal,
                      -(((float)j + pixel_center - half_h) / focal),
                      -1.0f};
      float wd[3];
      c2w.rotate(cam, wd);
      float inv = 1.0f / std::sqrt(wd[0] * wd[0] + wd[1] * wd[1] +
                                   wd[2] * wd[2]);
      wd[0] *= inv;
      wd[1] *= inv;
      wd[2] *= inv;
      int64_t off = ((int64_t)j * w + i) * 3;
      if (apply_ndc) {
        ndc_warp(h, w, focal, ndc_near, cx, cy, cz, wd[0], wd[1], wd[2],
                 o_img + off, d_img + off);
      } else {
        o_img[off + 0] = cx;
        o_img[off + 1] = cy;
        o_img[off + 2] = cz;
        d_img[off + 0] = wd[0];
        d_img[off + 1] = wd[1];
        d_img[off + 2] = wd[2];
      }
    }
  }
}

}  // namespace

extern "C" {

// c2w: (n_img, 3, 4) row-major f32. origins/dirs: (n_img, h, w, 3) f32
// out. apply_ndc: 0/1 (NDC with near plane ndc_near when 1).
void build_rays(const float* c2w, int n_img, int h, int w, float focal,
                int use_pixel_centers, int apply_ndc, float ndc_near,
                float* origins, float* dirs, int n_threads) {
  float pc = use_pixel_centers ? 0.5f : 0.0f;
  if (n_threads < 1) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
  }
  std::vector<std::thread> pool;
  std::vector<int> counter(1, 0);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int img = t; img < n_img; img += n_threads) {
        build_image_rays(c2w, img, h, w, focal, pc, apply_ndc, ndc_near,
                         origins, dirs);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// grouped subpixel reorder: (h, w, c) -> (h/ds * w/ds, ds*ds, c)
void group_subpixels(const float* src, int h, int w, int c, int ds,
                     float* dst) {
  int h1 = h / ds, w1 = w / ds;
  for (int bi = 0; bi < h1; ++bi) {
    for (int bj = 0; bj < w1; ++bj) {
      int64_t block = ((int64_t)bi * w1 + bj) * ds * ds;
      for (int si = 0; si < ds; ++si) {
        for (int sj = 0; sj < ds; ++sj) {
          const float* s =
              src + (((int64_t)(bi * ds + si) * w) + (bj * ds + sj)) * c;
          float* d = dst + (block + si * ds + sj) * c;
          for (int k = 0; k < c; ++k) d[k] = s[k];
        }
      }
    }
  }
}

}  // extern "C"
