// Fused JPEG decode -> crop -> resize -> (optional) normalize, C++.
//
// Native host-input-pipeline component (the reference's analogue is torch
// DataLoader's C workers + PIL decode, reference data/__init__.py:93-104;
// our threaded/process loaders call PIL per image).  This path fuses the
// whole per-image host pipeline into one GIL-free call:
//
//   * libjpeg-turbo DCT-scaled decode (M/8, never below the resize target)
//     -- decoding a 500px JPEG at 7/8 scale skips ~23% of the IDCT work;
//   * jpeg_crop_scanline + jpeg_skip_scanlines so a RandomResizedCrop
//     decodes ONLY its region (train crops average ~73% of the area at
//     scale=(0.5,1.0));
//   * Pillow-compatible convolution resampling (bicubic a=-0.5, antialias
//     support widening, fixed-point accumulation with Pillow's rounding) --
//     with DCT scaling disabled the decode+resize is BIT-EXACT vs
//     PIL.Image.resize(BICUBIC), which the parity tests assert;
//   * optional fused (x/255 - mean)/std to float32 CHW (the eval layout).
//
// Exposed via ctypes from madtp_tpu/native/__init__.py; the transforms use
// it only when MADTP_NATIVE_JPEG=1 (default stays the PIL path).
//
// Error codes: 0 ok; 1 corrupt/decode failure; 2 unsupported color space
// (CMYK/YCCK -> caller falls back to PIL).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

void emit_silent(j_common_ptr, int) {}

// ---- Pillow-compatible convolution resampling (fixed point) ----
// Algorithm per Pillow's documented resampling semantics (support-widened
// filter when downscaling, per-output normalized weights, 8-bit fixed-point
// accumulation); written fresh here.

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow's 8-bit precision

inline double bicubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// int32 accumulation is safe: weights are normalized to sum 1<<22, so the
// accumulated sum is bounded by 255 * 2^22 + 2^21 < 2^31 regardless of tap
// count (negative bicubic lobes only shrink the bound's positive part).
inline uint8_t clip8(int32_t v) {
  v >>= PRECISION_BITS;
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Per-output-pixel taps: bounds[2*i] = first input index, bounds[2*i+1] = n
// taps; kk[i*ksize .. +n] = fixed-point weights.
int precompute_coeffs(int in_size, double in0, double in1, int out_size,
                      std::vector<int>& bounds, std::vector<int>& kk) {
  const double scale = (in1 - in0) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // bicubic support = 2
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.assign(2 * out_size, 0);
  kk.assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> w(ksize);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; xx++) {
    const double center = in0 + (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double wsum = 0.0;
    for (int x = 0; x < xmax; x++) {
      w[x] = bicubic_filter((x + xmin - center + 0.5) * ss);
      wsum += w[x];
    }
    for (int x = 0; x < xmax; x++) {
      const double c = wsum == 0.0 ? 0.0 : w[x] / wsum;
      kk[static_cast<size_t>(xx) * ksize + x] = static_cast<int>(
          c < 0 ? (c * (1 << PRECISION_BITS) - 0.5)
                : (c * (1 << PRECISION_BITS) + 0.5));
    }
    bounds[2 * xx] = xmin;
    bounds[2 * xx + 1] = xmax;
  }
  return ksize;
}

// Horizontal then vertical pass, PLANAR per channel: contiguous tap loads
// in the horizontal pass and contiguous rows in the vertical pass both
// vectorize (the interleaved stride-3 version measured ~2x slower than
// Pillow's SIMD resampler; planar matches/beats it).  Output is written
// either interleaved uint8 HWC (`out_u8`) or fused-normalized float32 CHW
// (`out_f32`, planar already — no transpose): the float value normalizes
// the CLIPPED uint8 so it equals "PIL resize then (x/255-mean)/std" bit
// for bit.
void resample_rgb(const uint8_t* in, int in_w, int in_h, int in_stride,
                  double bx0, double by0, double bx1, double by1, int out_w,
                  int out_h, uint8_t* out_u8, float* out_f32,
                  const float* mean, const float* stdv) {
  std::vector<int> hb, hk, vb, vk;
  const int hks = precompute_coeffs(in_w, bx0, bx1, out_w, hb, hk);
  const int vks = precompute_coeffs(in_h, by0, by1, out_h, vb, vk);

  std::vector<uint8_t> plane(static_cast<size_t>(in_h) * in_w);
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w);
  std::vector<int32_t> acc(static_cast<size_t>(out_w));
  for (int c = 0; c < 3; c++) {
    // deinterleave this channel
    for (int y = 0; y < in_h; y++) {
      const uint8_t* row = in + static_cast<size_t>(y) * in_stride + c;
      uint8_t* prow = plane.data() + static_cast<size_t>(y) * in_w;
      for (int x = 0; x < in_w; x++) prow[x] = row[3 * x];
    }
    // horizontal: [in_h, in_w] -> [in_h, out_w], taps contiguous
    for (int y = 0; y < in_h; y++) {
      const uint8_t* prow = plane.data() + static_cast<size_t>(y) * in_w;
      uint8_t* trow = tmp.data() + static_cast<size_t>(y) * out_w;
      for (int xx = 0; xx < out_w; xx++) {
        const int xmin = hb[2 * xx], n = hb[2 * xx + 1];
        const int* k = hk.data() + static_cast<size_t>(xx) * hks;
        int32_t s = 1 << (PRECISION_BITS - 1);
        const uint8_t* p = prow + xmin;
        for (int x = 0; x < n; x++) s += static_cast<int32_t>(p[x]) * k[x];
        trow[xx] = clip8(s);
      }
    }
    // vertical: [in_h, out_w] -> [out_h, out_w], rows contiguous
    const float sc = out_f32 ? 1.0f / (255.0f * stdv[c]) : 0.0f;
    const float bi = out_f32 ? -mean[c] / stdv[c] : 0.0f;
    float* oplane =
        out_f32 ? out_f32 + static_cast<size_t>(c) * out_w * out_h : nullptr;
    for (int yy = 0; yy < out_h; yy++) {
      const int ymin = vb[2 * yy], n = vb[2 * yy + 1];
      const int* k = vk.data() + static_cast<size_t>(yy) * vks;
      std::fill(acc.begin(), acc.end(), 1 << (PRECISION_BITS - 1));
      for (int y = 0; y < n; y++) {
        const int32_t kk = k[y];
        const uint8_t* trow =
            tmp.data() + static_cast<size_t>(ymin + y) * out_w;
        int32_t* a = acc.data();
        for (int x = 0; x < out_w; x++)
          a[x] += static_cast<int32_t>(trow[x]) * kk;
      }
      if (oplane) {
        float* orow = oplane + static_cast<size_t>(yy) * out_w;
        for (int x = 0; x < out_w; x++)
          orow[x] = static_cast<float>(clip8(acc[x])) * sc + bi;
      } else {
        uint8_t* orow =
            out_u8 + (static_cast<size_t>(yy) * out_w) * 3 + c;
        for (int x = 0; x < out_w; x++) orow[3 * x] = clip8(acc[x]);
      }
    }
  }
}

}  // namespace

extern "C" {

// Resize (+ optional fused normalize) an ALREADY-DECODED uint8 HWC RGB
// image — the non-JPEG formats' (PNG NLVR2 images) share of the fused
// pipeline.  Same Pillow-bicubic semantics as the JPEG path; GIL-free.
int madtp_resize_norm(const uint8_t* in, int in_w, int in_h, int crop_x,
                      int crop_y, int crop_w, int crop_h, int out_w,
                      int out_h, int fuse_norm, const float* mean,
                      const float* stdv, uint8_t* out_u8, float* out_f32) {
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = in_w;
    crop_h = in_h;
  }
  crop_x = std::max(0, std::min(crop_x, in_w - 1));
  crop_y = std::max(0, std::min(crop_y, in_h - 1));
  crop_w = std::min(crop_w, in_w - crop_x);
  crop_h = std::min(crop_h, in_h - crop_y);
  resample_rgb(in + (static_cast<size_t>(crop_y) * in_w + crop_x) * 3,
               crop_w, crop_h, in_w * 3, 0.0, 0.0, crop_w, crop_h, out_w,
               out_h, fuse_norm ? nullptr : out_u8,
               fuse_norm ? out_f32 : nullptr, mean, stdv);
  return 0;
}

// Header-only dimension probe.  Returns 0 on success.
int madtp_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = err_exit;
  err.pub.emit_message = emit_silent;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode `data`, crop (full-resolution pixel coords; crop_w<=0 means the
// whole image), resize to (out_w, out_h) with Pillow-bicubic semantics.
// allow_dct_scale: permit M/8 scaled decode (never below the target size).
// fuse_norm: 0 -> out_u8 gets HWC RGB; 1 -> out_f32 gets normalized CHW
// float32 with per-channel (x/255 - mean)/std.
int madtp_decode_resize(const uint8_t* data, size_t len, int crop_x,
                        int crop_y, int crop_w, int crop_h, int out_w,
                        int out_h, int allow_dct_scale, int fuse_norm,
                        const float* mean, const float* stdv, uint8_t* out_u8,
                        float* out_f32) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  // declared BEFORE setjmp so a longjmp'd error return still runs their
  // destructors on the way out (declared after, the heap blocks would leak
  // on every corrupt file)
  std::vector<uint8_t> buf;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = err_exit;
  err.pub.emit_message = emit_silent;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;  // PIL fallback
  }
  const int W = static_cast<int>(cinfo.image_width);
  const int H = static_cast<int>(cinfo.image_height);
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = W;
    crop_h = H;
  }
  crop_x = std::max(0, std::min(crop_x, W - 1));
  crop_y = std::max(0, std::min(crop_y, H - 1));
  crop_w = std::min(crop_w, W - crop_x);
  crop_h = std::min(crop_h, H - crop_y);

  // Smallest power-of-two M/8 decode scale that keeps the (scaled) crop >=
  // the target in both dims -- downsampling work moves into the IDCT and
  // never upscales.  Only 1/8, 2/8, 4/8 use libjpeg-turbo's small fast
  // IDCTs; odd scales like 7/8 run 14-point IDCTs at ~full-decode cost for
  // marginal savings (measured), so they're skipped.
  int M = 8;
  if (allow_dct_scale) {
    for (int m : {1, 2, 4}) {
      if (static_cast<int64_t>(crop_w) * m >= static_cast<int64_t>(out_w) * 8 &&
          static_cast<int64_t>(crop_h) * m >= static_cast<int64_t>(out_h) * 8) {
        M = m;
        break;
      }
    }
  }
  cinfo.scale_num = M;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int SW = static_cast<int>(cinfo.output_width);
  const int SH = static_cast<int>(cinfo.output_height);

  // Crop box in scaled coordinates (float; the resampler takes a float box
  // so sub-pixel alignment survives the integer decode region).
  const double s = static_cast<double>(M) / 8.0;
  double fx0 = crop_x * s, fy0 = crop_y * s;
  double fx1 = std::min<double>((crop_x + crop_w) * s, SW);
  double fy1 = std::min<double>((crop_y + crop_h) * s, SH);
  int ix0 = std::max(0, static_cast<int>(std::floor(fx0)));
  int iy0 = std::max(0, static_cast<int>(std::floor(fy0)));
  int ix1 = std::min(SW, static_cast<int>(std::ceil(fx1)));
  int iy1 = std::min(SH, static_cast<int>(std::ceil(fy1)));

  // Widen the decoded region by a 4px margin: the fancy chroma upsampler
  // replicates at the cropped region's edges, so the outermost decoded
  // column differs from a full decode — keep it outside the resample view.
  const int ex0 = std::max(0, ix0 - 4);
  const int ex1 = std::min(SW, ix1 + 4);
  JDIMENSION xoff = static_cast<JDIMENSION>(ex0);
  JDIMENSION xw = static_cast<JDIMENSION>(std::max(1, ex1 - ex0));
  if (ex0 > 0 || ex1 < SW)
    // rounds xoff down / widens xw to iMCU boundaries and updates both
    jpeg_crop_scanline(&cinfo, &xoff, &xw);
  if (iy0 > 0)
    jpeg_skip_scanlines(&cinfo, static_cast<JDIMENSION>(iy0));
  // skip may land earlier than requested in some sampling modes — index
  // the buffer from wherever the decoder actually is
  const int base = std::min<int>(static_cast<int>(cinfo.output_scanline), iy0);

  const int rows = std::max(1, iy1 - base);
  const int stride = static_cast<int>(xw) * 3;
  buf.resize(static_cast<size_t>(rows) * stride);
  while (static_cast<int>(cinfo.output_scanline) < iy1) {
    JSAMPROW rowp =
        buf.data() +
        static_cast<size_t>(static_cast<int>(cinfo.output_scanline) - base) *
            stride;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_abort_decompress(&cinfo);  // skip the rest without EOF checks
  jpeg_destroy_decompress(&cinfo);

  // Present the resampler with EXACTLY the crop region so its tap clamping
  // happens at the crop edges — PIL's crop().resize() semantics (a wider
  // view would let edge taps read pixels outside the crop).
  const int col0 = std::max(0, ix0 - static_cast<int>(xoff));
  const int row0 = std::max(0, iy0 - base);
  resample_rgb(buf.data() + static_cast<size_t>(row0) * stride + col0 * 3,
               ix1 - ix0, iy1 - iy0, stride, fx0 - ix0, fy0 - iy0, fx1 - ix0,
               fy1 - iy0, out_w, out_h, fuse_norm ? nullptr : out_u8,
               fuse_norm ? out_f32 : nullptr, mean, stdv);
  return 0;
}

}  // extern "C"
