// Native host-side image IO kernels for the torchok_tpu data pipeline.
//
// The reference's data-loading hot loop runs through OpenCV's C++ core
// (reference: torchok/data/datasets/base.py:67-92 — cv2.imread + cvtColor
// per sample, SURVEY.md §3.1 "HOT LOOP (CPU)").  This library is the
// first-party native equivalent: JPEG/PNG decode, RGB conversion and
// bilinear resize implemented as a plain C ABI with NO Python dependency,
// so the ctypes wrapper can release the GIL for the whole decode+resize —
// making the DataLoader's thread-pool fetch genuinely parallel (cv2 holds
// the GIL around parts of imread; libjpeg here runs fully GIL-free).
//
// Build: g++ -O3 -fPIC -shared io_kernels.cpp -ljpeg -lpng -o libtorchok_io.so
// (driven by torchok_tpu/native/build.py, cached by content hash).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// error handling: libjpeg longjmp trampoline (no exceptions across C ABI)
// ---------------------------------------------------------------------------
struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// ---------------------------------------------------------------------------
// probe: return 1 if the buffer looks like JPEG, 2 for PNG, 0 otherwise
// ---------------------------------------------------------------------------
int tkio_probe(const uint8_t* data, int64_t size) {
    if (size >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF)
        return 1;
    if (size >= 8 && png_sig_cmp(const_cast<uint8_t*>(data), 0, 8) == 0)
        return 2;
    return 0;
}

// ---------------------------------------------------------------------------
// JPEG: header peek (width/height/channels) and decode
// ---------------------------------------------------------------------------
int tkio_jpeg_info(const uint8_t* data, int64_t size,
                   int* width, int* height, int* channels) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
    jpeg_read_header(&cinfo, TRUE);
    *width = static_cast<int>(cinfo.image_width);
    *height = static_cast<int>(cinfo.image_height);
    *channels = 3;  // decoded as RGB below regardless of source space
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode a JPEG into a caller-allocated RGB (H, W, 3) uint8 buffer.
int tkio_jpeg_decode(const uint8_t* data, int64_t size, uint8_t* out,
                     int out_h, int out_w) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_width) != out_w ||
        static_cast<int>(cinfo.output_height) != out_h ||
        cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    const int stride = out_w * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + static_cast<int64_t>(cinfo.output_scanline) * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// ---------------------------------------------------------------------------
// PNG: header peek and decode (always expanded to RGBA)
// ---------------------------------------------------------------------------
struct PngReadState {
    const uint8_t* data;
    int64_t size;
    int64_t offset;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
    PngReadState* st = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
    if (st->offset + static_cast<int64_t>(n) > st->size) {
        png_error(png, "torchok_io: png read past end");
        return;
    }
    std::memcpy(out, st->data + st->offset, n);
    st->offset += static_cast<int64_t>(n);
}

int tkio_png_info(const uint8_t* data, int64_t size,
                  int* width, int* height, int* channels) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return -1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -1;
    }
    PngReadState st{data, size, 0};
    png_set_read_fn(png, &st, png_read_fn);
    png_read_info(png, info);
    *width = static_cast<int>(png_get_image_width(png, info));
    *height = static_cast<int>(png_get_image_height(png, info));
    *channels = 4;  // decoded as RGBA below
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
}

// Decode a PNG into a caller-allocated RGBA (H, W, 4) uint8 buffer.
int tkio_png_decode(const uint8_t* data, int64_t size, uint8_t* out,
                    int out_h, int out_w) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return -1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -1;
    }
    PngReadState st{data, size, 0};
    png_set_read_fn(png, &st, png_read_fn);
    png_read_info(png, info);

    // normalize everything to 8-bit RGBA
    png_set_expand(png);            // palette/gray->8bit, tRNS->alpha
    png_set_strip_16(png);
    png_set_gray_to_rgb(png);
    png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);
    png_read_update_info(png, info);

    const int w = static_cast<int>(png_get_image_width(png, info));
    const int h = static_cast<int>(png_get_image_height(png, info));
    if (w != out_w || h != out_h ||
        png_get_channels(png, info) != 4) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -2;
    }
    for (int y = 0; y < h; ++y) {
        png_bytep row = out + static_cast<int64_t>(y) * w * 4;
        png_read_row(png, row, nullptr);
    }
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
}

// ---------------------------------------------------------------------------
// Bilinear resize, uint8 HWC (half-pixel centers, matches cv2 INTER_LINEAR)
// ---------------------------------------------------------------------------
void tkio_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                             uint8_t* dst, int dh, int dw) {
    const float scale_y = static_cast<float>(sh) / dh;
    const float scale_x = static_cast<float>(sw) / dw;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * scale_y - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        float wy = fy - y0;
        int y1 = std::min(y0 + 1, sh - 1);
        y0 = std::max(y0, 0);
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * scale_x - 0.5f;
            int x0 = static_cast<int>(std::floor(fx));
            float wx = fx - x0;
            int x1 = std::min(x0 + 1, sw - 1);
            x0 = std::max(x0, 0);
            const uint8_t* p00 = src + (static_cast<int64_t>(y0) * sw + x0) * c;
            const uint8_t* p01 = src + (static_cast<int64_t>(y0) * sw + x1) * c;
            const uint8_t* p10 = src + (static_cast<int64_t>(y1) * sw + x0) * c;
            const uint8_t* p11 = src + (static_cast<int64_t>(y1) * sw + x1) * c;
            uint8_t* q = dst + (static_cast<int64_t>(y) * dw + x) * c;
            for (int k = 0; k < c; ++k) {
                float v = p00[k] * (1 - wy) * (1 - wx) + p01[k] * (1 - wy) * wx
                        + p10[k] * wy * (1 - wx) + p11[k] * wy * wx;
                q[k] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Fused decode (+optional resize): one call per image, fully GIL-free.
// kind: from tkio_probe. out buffer: (out_h, out_w, channels) uint8 where
// channels = 3 for JPEG, 4 for PNG. When (out_h, out_w) differ from the
// natural size, decodes to a scratch buffer and bilinearly resizes.
// ---------------------------------------------------------------------------
int tkio_decode(const uint8_t* data, int64_t size, int kind,
                uint8_t* out, int out_h, int out_w) {
    int w = 0, h = 0, c = 0;
    int rc = kind == 1 ? tkio_jpeg_info(data, size, &w, &h, &c)
                       : tkio_png_info(data, size, &w, &h, &c);
    if (rc != 0) return rc;
    if (w == out_w && h == out_h) {
        return kind == 1 ? tkio_jpeg_decode(data, size, out, out_h, out_w)
                         : tkio_png_decode(data, size, out, out_h, out_w);
    }
    uint8_t* scratch = static_cast<uint8_t*>(
        std::malloc(static_cast<int64_t>(w) * h * c));
    if (!scratch) return -3;
    rc = kind == 1 ? tkio_jpeg_decode(data, size, scratch, h, w)
                   : tkio_png_decode(data, size, scratch, h, w);
    if (rc == 0)
        tkio_resize_bilinear_u8(scratch, h, w, c, out, out_h, out_w);
    std::free(scratch);
    return rc;
}

}  // extern "C"
