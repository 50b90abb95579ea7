// Native host image pipeline: letterbox resize + batch assembly.
//
// The runtime role the reference fills with native code (its CUDA DCNv3
// extension + torchvision C++ NMS) maps on TPU to XLA/Pallas device
// kernels; the remaining native-worthy hot path is the HOST data loader:
// per-image bilinear letterbox into a preallocated NHWC batch buffer,
// pthread-parallel across images. cv2-compatible sampling (pixel-center
// aligned bilinear, INTER_LINEAR) so outputs are interchangeable with the
// Python path (yolosomi_tpu/data/augment.py letterbox).
//
// Built by yolosomi_tpu/native.py via g++ -O3 -shared; loaded with ctypes.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <pthread.h>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// bilinear sample with cv2's pixel-center convention
inline void sample_row_setup(float sy, int h, int* y0, int* y1, float* wy) {
  float fy = clampf(sy, 0.f, (float)(h - 1));
  *y0 = (int)fy;
  *y1 = std::min(*y0 + 1, h - 1);
  *wy = fy - (float)*y0;
}

void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw, int ch) {
  const float sx_ratio = (float)sw / dw;
  const float sy_ratio = (float)sh / dh;
  for (int y = 0; y < dh; ++y) {
    int y0, y1; float wy;
    sample_row_setup(((float)y + 0.5f) * sy_ratio - 0.5f, sh, &y0, &y1, &wy);
    const uint8_t* r0 = src + (size_t)y0 * sw * ch;
    const uint8_t* r1 = src + (size_t)y1 * sw * ch;
    uint8_t* out = dst + (size_t)y * dw * ch;
    for (int x = 0; x < dw; ++x) {
      int x0, x1; float wx;
      sample_row_setup(((float)x + 0.5f) * sx_ratio - 0.5f, sw, &x0, &x1, &wx);
      for (int c = 0; c < ch; ++c) {
        float top = r0[x0 * ch + c] * (1 - wx) + r0[x1 * ch + c] * wx;
        float bot = r1[x0 * ch + c] * (1 - wx) + r1[x1 * ch + c] * wx;
        out[x * ch + c] = (uint8_t)(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

struct Job {
  const uint8_t* src;
  int sh, sw;
  uint8_t* dst;     // points into the batch buffer at image slot
  int oh, ow, ch;
  int pad_value;
  float* ratio_out; // [r]
  float* pad_out;   // [dw, dh] (half-paddings)
};

void run_job(const Job& j) {
  float r = std::min((float)j.oh / j.sh, (float)j.ow / j.sw);
  int nw = (int)std::lround(j.sw * r);
  int nh = (int)std::lround(j.sh * r);
  float dw = (j.ow - nw) / 2.0f;
  float dh = (j.oh - nh) / 2.0f;
  int left = (int)std::lround(dw - 0.1f);
  int top = (int)std::lround(dh - 0.1f);

  // fill with pad value
  memset(j.dst, j.pad_value, (size_t)j.oh * j.ow * j.ch);
  // resize into a stack buffer region (write directly with offset)
  // simple approach: resize into temp then blit
  uint8_t* tmp = new uint8_t[(size_t)nh * nw * j.ch];
  resize_bilinear_u8(j.src, j.sh, j.sw, tmp, nh, nw, j.ch);
  for (int y = 0; y < nh; ++y) {
    memcpy(j.dst + ((size_t)(y + top) * j.ow + left) * j.ch,
           tmp + (size_t)y * nw * j.ch, (size_t)nw * j.ch);
  }
  delete[] tmp;
  if (j.ratio_out) j.ratio_out[0] = r;
  if (j.pad_out) { j.pad_out[0] = dw; j.pad_out[1] = dh; }
}

void* worker(void* arg) {
  run_job(*(Job*)arg);
  return nullptr;
}

}  // namespace

extern "C" {

// Single-image letterbox: src (sh, sw, ch) u8 -> dst (oh, ow, ch) u8.
void letterbox_u8(const uint8_t* src, int sh, int sw, int ch,
                  uint8_t* dst, int oh, int ow, int pad_value,
                  float* ratio_out, float* pad_out) {
  Job j{src, sh, sw, dst, oh, ow, ch, pad_value, ratio_out, pad_out};
  run_job(j);
}

// Batch assembly: n images (pointers + dims) letterboxed in parallel into
// one (n, oh, ow, ch) u8 buffer. Returns per-image ratio and (dw, dh).
void assemble_batch_u8(const uint8_t** srcs, const int* shs, const int* sws,
                       int n, int ch, uint8_t* batch, int oh, int ow,
                       int pad_value, float* ratios, float* pads,
                       int n_threads) {
  Job* jobs = new Job[n];
  for (int i = 0; i < n; ++i) {
    jobs[i] = Job{srcs[i], shs[i], sws[i],
                  batch + (size_t)i * oh * ow * ch, oh, ow, ch, pad_value,
                  ratios ? ratios + i : nullptr,
                  pads ? pads + 2 * i : nullptr};
  }
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) run_job(jobs[i]);
  } else {
    pthread_t* th = new pthread_t[n];
    for (int i = 0; i < n; ++i) pthread_create(&th[i], nullptr, worker, &jobs[i]);
    for (int i = 0; i < n; ++i) pthread_join(th[i], nullptr);
    delete[] th;
  }
  delete[] jobs;
}

}  // extern "C"
