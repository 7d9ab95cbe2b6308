// Native image pipeline: JPEG/PNG decode + ADM center-crop + normalize.
//
// The reference's input pipeline runs through torchvision/PIL C code
// (SURVEY.md §2.3). This is the framework's own native host path: decode
// (libjpeg / libpng), the ADM preprocessing used by every eval script
// (iterative 2x BOX halving while min-side >= 2*target, then a PIL-style
// filtered BICUBIC resize of the shorter side to target, then center crop
// — reference image_model/inference.py:95-111), and [-1,1] float output,
// all in one call that releases the GIL via ctypes.
//
// The bicubic resampler mirrors PIL's convolution resampling: Keys cubic
// (a = -0.5), kernel support scaled by the downscale factor, normalized
// weights. Output matches PIL within ~1/255 per channel; PIL remains the
// bit-parity path.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct ImageU8 {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ------------------------------- JPEG ------------------------------------

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// -------------------------------- PNG ------------------------------------

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + count > s->len) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(out, s->data + s->pos, count);
  s->pos += count;
}

bool decode_png(const uint8_t* data, size_t len, ImageU8* out) {
  if (len < 8 || png_sig_cmp(data, 0, 8) != 0) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{data, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// --------------------------- resampling ----------------------------------

void box_halve(ImageU8* img) {
  int nw = img->w / 2, nh = img->h / 2;
  std::vector<uint8_t> out(static_cast<size_t>(nw) * nh * 3);
  for (int y = 0; y < nh; ++y) {
    const uint8_t* r0 = img->rgb.data() + static_cast<size_t>(2 * y) * img->w * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(img->w) * 3;
    uint8_t* o = out.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      for (int c = 0; c < 3; ++c) {
        int s = r0[(2 * x) * 3 + c] + r0[(2 * x + 1) * 3 + c] +
                r1[(2 * x) * 3 + c] + r1[(2 * x + 1) * 3 + c];
        o[x * 3 + c] = static_cast<uint8_t>((s + 2) >> 2);
      }
    }
  }
  img->rgb.swap(out);
  img->w = nw;
  img->h = nh;
}

double cubic(double x) {  // Keys a = -0.5 (PIL BICUBIC)
  x = std::fabs(x);
  if (x < 1.0) return ((1.5 * x - 2.5) * x) * x + 1.0;
  if (x < 2.0) return (((-0.5 * x) + 2.5) * x - 4.0) * x + 2.0;
  return 0.0;
}

// PIL-style separable filtered resize along one axis.
void resample_axis(const std::vector<float>& in, int in_len, int other,
                   int out_len, std::vector<float>* out) {
  out->assign(static_cast<size_t>(out_len) * other * 3, 0.f);
  double scale = static_cast<double>(in_len) / out_len;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;
  for (int xo = 0; xo < out_len; ++xo) {
    double center = (xo + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_len) xmax = in_len;
    std::vector<double> w(xmax - xmin);
    double wsum = 0;
    for (int x = xmin; x < xmax; ++x) {
      double v = cubic((x + 0.5 - center) / filterscale);
      w[x - xmin] = v;
      wsum += v;
    }
    if (wsum != 0)
      for (double& v : w) v /= wsum;
    for (int y = 0; y < other; ++y) {
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        for (int x = xmin; x < xmax; ++x)
          acc += w[x - xmin] *
                 in[(static_cast<size_t>(y) * in_len + x) * 3 + c];
        (*out)[(static_cast<size_t>(y) * out_len + xo) * 3 + c] =
            static_cast<float>(acc);
      }
    }
  }
}

// Full bicubic resize (w,h) -> (nw,nh), float intermediate.
void bicubic_resize(ImageU8* img, int nw, int nh) {
  size_t n = static_cast<size_t>(img->w) * img->h * 3;
  std::vector<float> f(n);
  for (size_t i = 0; i < n; ++i) f[i] = img->rgb[i];
  // horizontal: rows stay, width changes (in row-major, x is fastest)
  std::vector<float> tmp;
  resample_axis(f, img->w, img->h, nw, &tmp);
  // vertical: transpose, resample, transpose back
  std::vector<float> t(static_cast<size_t>(nw) * img->h * 3);
  for (int y = 0; y < img->h; ++y)
    for (int x = 0; x < nw; ++x)
      for (int c = 0; c < 3; ++c)
        t[(static_cast<size_t>(x) * img->h + y) * 3 + c] =
            tmp[(static_cast<size_t>(y) * nw + x) * 3 + c];
  std::vector<float> t2;
  resample_axis(t, img->h, nw, nh, &t2);
  img->rgb.resize(static_cast<size_t>(nw) * nh * 3);
  for (int y = 0; y < nh; ++y)
    for (int x = 0; x < nw; ++x)
      for (int c = 0; c < 3; ++c) {
        float v = t2[(static_cast<size_t>(x) * nh + y) * 3 + c];
        v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
        img->rgb[(static_cast<size_t>(y) * nw + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
  img->w = nw;
  img->h = nh;
}

}  // namespace

extern "C" {

// Decode + ADM center-crop to image_size, write float32 HWC in [-1, 1].
// Returns 0 on success, negative error codes otherwise.
int jn_decode_center_crop(const uint8_t* data, long len, int image_size,
                          float* out) {
  ImageU8 img;
  if (!decode_png(data, static_cast<size_t>(len), &img) &&
      !decode_jpeg(data, static_cast<size_t>(len), &img))
    return -1;
  if (img.w < 1 || img.h < 1) return -2;
  while (std::min(img.w, img.h) >= 2 * image_size) box_halve(&img);
  double scale = static_cast<double>(image_size) / std::min(img.w, img.h);
  int nw = static_cast<int>(std::lround(img.w * scale));
  int nh = static_cast<int>(std::lround(img.h * scale));
  if (nw != img.w || nh != img.h) bicubic_resize(&img, nw, nh);
  int cy = (img.h - image_size) / 2;
  int cx = (img.w - image_size) / 2;
  if (cy < 0 || cx < 0) return -3;
  for (int y = 0; y < image_size; ++y) {
    const uint8_t* row =
        img.rgb.data() + (static_cast<size_t>(cy + y) * img.w + cx) * 3;
    float* o = out + static_cast<size_t>(y) * image_size * 3;
    for (int i = 0; i < image_size * 3; ++i)
      o[i] = row[i] * (2.0f / 255.0f) - 1.0f;
  }
  return 0;
}

// Probe decoded dimensions without full processing (-1 on failure).
int jn_probe(const uint8_t* data, long len, int* w, int* h) {
  ImageU8 img;
  if (!decode_png(data, static_cast<size_t>(len), &img) &&
      !decode_jpeg(data, static_cast<size_t>(len), &img))
    return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

}  // extern "C"
