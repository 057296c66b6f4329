// adsr_tpu native data loader: threaded PNG decode + Lanczos-3 resize.
//
// The reference's data prep and loading are sequential PIL calls
// (reference scripts/prepare_mvtec_data.py:22-33, src/data.py:153-161). This
// library provides the native runtime equivalent: libpng decode and a
// fixed-point separable Lanczos resampler matching Pillow's algorithm
// (horizontal pass quantized to uint8, then vertical, PRECISION_BITS=22
// fixed-point accumulation), fanned out over a std::thread pool.
//
// C ABI (ctypes): all functions return 0 on success, negative on error.

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's fixed-point precision

inline uint8_t clip8(int64_t v) {
    v >>= kPrecisionBits;
    return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

double lanczos3(double x) {
    if (x <= -3.0 || x >= 3.0) return 0.0;
    if (x == 0.0) return 1.0;
    const double pix = M_PI * x;
    return 3.0 * std::sin(pix) * std::sin(pix / 3.0) / (pix * pix);
}

// Pillow-style coefficient table for one axis.
struct Coeffs {
    int ksize;                 // taps per output pixel
    std::vector<int> bounds;   // [out, 2]: (xmin, xcount)
    std::vector<int32_t> kk;   // [out, ksize] fixed-point weights
};

Coeffs build_coeffs(int in_size, int out_size) {
    Coeffs c;
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 3.0 * filterscale;
    c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    c.bounds.resize(out_size * 2);
    c.kk.assign(static_cast<size_t>(out_size) * c.ksize, 0);
    std::vector<double> w(c.ksize);
    for (int xx = 0; xx < out_size; ++xx) {
        const double center = (xx + 0.5) * scale;
        double ww = 0.0;
        const double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        for (int x = 0; x < xmax; ++x) {
            const double v = lanczos3((x + xmin - center + 0.5) * ss);
            w[x] = v;
            ww += v;
        }
        for (int x = 0; x < xmax; ++x) {
            if (ww != 0.0) w[x] /= ww;
            const double kv = w[x] * (1 << kPrecisionBits);
            c.kk[static_cast<size_t>(xx) * c.ksize + x] =
                static_cast<int32_t>(kv < 0 ? kv - 0.5 : kv + 0.5);
        }
        c.bounds[xx * 2] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// Horizontal resample: [h, in_w, ch] -> [h, out_w, ch], uint8.
void resample_h(const uint8_t* src, uint8_t* dst, int h, int in_w, int out_w,
                int ch, const Coeffs& c) {
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * in_w * ch;
        uint8_t* orow = dst + static_cast<size_t>(y) * out_w * ch;
        for (int x = 0; x < out_w; ++x) {
            const int xmin = c.bounds[x * 2];
            const int xcount = c.bounds[x * 2 + 1];
            const int32_t* k = &c.kk[static_cast<size_t>(x) * c.ksize];
            for (int b = 0; b < ch; ++b) {
                int64_t ss = 1LL << (kPrecisionBits - 1);
                for (int i = 0; i < xcount; ++i)
                    ss += static_cast<int64_t>(row[(xmin + i) * ch + b]) * k[i];
                orow[x * ch + b] = clip8(ss);
            }
        }
    }
}

// Vertical resample: [in_h, w, ch] -> [out_h, w, ch], uint8.
void resample_v(const uint8_t* src, uint8_t* dst, int in_h, int out_h, int w,
                int ch, const Coeffs& c) {
    for (int y = 0; y < out_h; ++y) {
        const int ymin = c.bounds[y * 2];
        const int ycount = c.bounds[y * 2 + 1];
        const int32_t* k = &c.kk[static_cast<size_t>(y) * c.ksize];
        uint8_t* orow = dst + static_cast<size_t>(y) * w * ch;
        for (int x = 0; x < w * ch; ++x) {
            int64_t ss = 1LL << (kPrecisionBits - 1);
            for (int i = 0; i < ycount; ++i)
                ss += static_cast<int64_t>(
                          src[static_cast<size_t>(ymin + i) * w * ch + x]) *
                      k[i];
            orow[x] = clip8(ss);
        }
    }
}

// Decode preserving grayscale (1ch) vs color (3ch) — the Python pipeline's
// channel rules depend on the source channel count (reference data.py:52-65).
int decode_png_native(const char* path, std::vector<uint8_t>* out, int* w,
                      int* h, int* channels, bool force_rgb) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) { std::fclose(fp); return -2; }
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr);
                 std::fclose(fp); return -2; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    // normalize to 8-bit; gray stays 1ch unless force_rgb
    png_set_strip_16(png);
    png_set_palette_to_rgb(png);
    png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
    const int color_type = png_get_color_type(png, info);
    const bool is_gray = (color_type == PNG_COLOR_TYPE_GRAY ||
                          color_type == PNG_COLOR_TYPE_GRAY_ALPHA);
    if (force_rgb || !is_gray) {
        png_set_gray_to_rgb(png);
        *channels = 3;
    } else {
        *channels = 1;
    }
    png_read_update_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    out->resize(static_cast<size_t>(*w) * *h * *channels);
    std::vector<png_bytep> rows(*h);
    for (int y = 0; y < *h; ++y)
        rows[y] = out->data() + static_cast<size_t>(y) * *w * *channels;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

int resize_lanczos_rgb(const uint8_t* src, int in_h, int in_w, uint8_t* dst,
                       int out_h, int out_w, int ch) {
    const Coeffs ch_coef = build_coeffs(in_w, out_w);
    std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * ch);
    resample_h(src, tmp.data(), in_h, in_w, out_w, ch, ch_coef);
    const Coeffs cv = build_coeffs(in_h, out_h);
    resample_v(tmp.data(), dst, in_h, out_h, out_w, ch, cv);
    return 0;
}

}  // namespace

extern "C" {

// Decode one PNG into caller buffer of size cap; writes dims + channel count
// (1 = grayscale source, 3 = color). force_rgb != 0 always expands to RGB.
int adsr_decode_png(const char* path, uint8_t* out, long cap, int* h, int* w,
                    int* channels, int force_rgb) {
    std::vector<uint8_t> buf;
    int rc = decode_png_native(path, &buf, w, h, channels, force_rgb != 0);
    if (rc) return rc;
    if (static_cast<long>(buf.size()) > cap) return -4;
    std::memcpy(out, buf.data(), buf.size());
    return 0;
}

// Lanczos-3 resize, uint8 HWC.
int adsr_resize_lanczos(const uint8_t* src, int in_h, int in_w, int ch,
                        uint8_t* dst, int out_h, int out_w) {
    if (ch < 1 || ch > 4) return -5;
    return resize_lanczos_rgb(src, in_h, in_w, dst, out_h, out_w, ch);
}

// Threaded batch: decode n PNGs and resize each to (out_h, out_w) RGB,
// writing into out[n, out_h, out_w, 3]. paths is a NUL-separated blob.
int adsr_load_batch(const char* paths_blob, int n, int out_h, int out_w,
                    uint8_t* out, int n_threads) {
    std::vector<const char*> paths(n);
    const char* p = paths_blob;
    for (int i = 0; i < n; ++i) {
        paths[i] = p;
        p += std::strlen(p) + 1;
    }
    std::atomic<int> next(0), err(0);
    auto worker = [&]() {
        std::vector<uint8_t> buf;
        int w = 0, h = 0, ch = 0;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n || err.load()) return;
            buf.clear();
            if (decode_png_native(paths[i], &buf, &w, &h, &ch, true)) {
                err = 1;
                return;
            }
            uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
            if (w == out_w && h == out_h) {
                std::memcpy(dst, buf.data(), buf.size());
            } else if (resize_lanczos_rgb(buf.data(), h, w, dst, out_h,
                                          out_w, 3)) {
                err = 1;
                return;
            }
        }
    };
    const int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return err.load() ? -6 : 0;
}

}  // extern "C"
