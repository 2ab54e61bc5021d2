// Native data-IO core: JPEG decode + shortest-edge resize + flip + pad.
//
// The reference feeds its models through torch DataLoader worker processes
// (C++ core); this is our equivalent native path — the host-side image
// pipeline runs here (libjpeg decode, bilinear resize, BGR convert,
// horizontal flip, padded-canvas write), OpenMP-parallel across a batch,
// leaving Python only orchestration. Exposed via a C ABI for ctypes
// (no pybind11 in this image).
//
// Build: see tools/build_native.sh (g++ -O3 -shared -ljpeg -fopenmp).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

// Decode a JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& h, int& w) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;

    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    w = cinfo.output_width;
    h = cinfo.output_height;
    rgb.resize(static_cast<size_t>(h) * w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

// detectron2 ResizeShortestEdge output size rule.
void shortest_edge_size(int h, int w, int short_edge, int max_size,
                        int& nh, int& nw) {
    double scale = static_cast<double>(short_edge) / std::min(h, w);
    double fh, fw;
    if (h < w) {
        fh = short_edge;
        fw = scale * w;
    } else {
        fh = scale * h;
        fw = short_edge;
    }
    if (std::max(fh, fw) > max_size) {
        double s2 = max_size / std::max(fh, fw);
        fh *= s2;
        fw *= s2;
    }
    nh = static_cast<int>(fh + 0.5);
    nw = static_cast<int>(fw + 0.5);
}

// Bilinear resize RGB8 -> float32 canvas (out_h, out_w, 3), with optional
// horizontal flip and RGB->BGR swap. Canvas regions beyond (nh, nw) stay 0.
void resize_into(const uint8_t* src, int h, int w, int nh, int nw,
                 float* dst, int out_h, int out_w, bool flip, bool bgr) {
    const double sy = static_cast<double>(h) / nh;
    const double sx = static_cast<double>(w) / nw;
    for (int y = 0; y < nh && y < out_h; ++y) {
        double fy = (y + 0.5) * sy - 0.5;
        fy = std::max(0.0, std::min(fy, h - 1.0));
        int y0 = static_cast<int>(fy);
        int y1 = std::min(y0 + 1, h - 1);
        double ly = fy - y0;
        float* drow = dst + (static_cast<size_t>(y) * out_w) * 3;
        for (int x = 0; x < nw && x < out_w; ++x) {
            int xs = flip ? (nw - 1 - x) : x;
            double fx = (xs + 0.5) * sx - 0.5;
            fx = std::max(0.0, std::min(fx, w - 1.0));
            int x0 = static_cast<int>(fx);
            int x1 = std::min(x0 + 1, w - 1);
            double lx = fx - x0;
            const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
            const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
            const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
            const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
            for (int c = 0; c < 3; ++c) {
                double v = (1 - ly) * ((1 - lx) * p00[c] + lx * p01[c]) +
                           ly * ((1 - lx) * p10[c] + lx * p11[c]);
                int cc = bgr ? (2 - c) : c;
                drow[x * 3 + cc] = static_cast<float>(v);
            }
        }
    }
}

}  // namespace

extern "C" {

// Process one image: decode path, resize shortest-edge, flip, write into
// the zeroed float32 canvas (out_h, out_w, 3). Returns 0 on success.
// out_hw receives the resized (nh, nw); orig_hw the decoded (h, w).
int fsodtf_load_image(const char* path, int short_edge, int max_size,
                      int out_h, int out_w, int flip, int bgr,
                      float* canvas, int* out_hw, int* orig_hw) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    if (!decode_jpeg(path, rgb, h, w)) return 1;
    int nh, nw;
    shortest_edge_size(h, w, short_edge, max_size, nh, nw);
    std::memset(canvas, 0, sizeof(float) * out_h * out_w * 3);
    resize_into(rgb.data(), h, w, nh, nw, canvas, out_h, out_w,
                flip != 0, bgr != 0);
    out_hw[0] = nh;
    out_hw[1] = nw;
    orig_hw[0] = h;
    orig_hw[1] = w;
    return 0;
}

// Batch variant, OpenMP-parallel. paths: array of C strings. shorts/flips
// are per-image. canvases: contiguous (n, out_h, out_w, 3) float32.
// Returns the number of failures.
int fsodtf_load_batch(const char** paths, int n, const int* shorts,
                      int max_size, int out_h, int out_w, const int* flips,
                      int bgr, float* canvases, int* out_hws, int* orig_hws) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        float* canvas = canvases + static_cast<size_t>(i) * out_h * out_w * 3;
        int rc = fsodtf_load_image(paths[i], shorts[i], max_size, out_h,
                                   out_w, flips[i], bgr, canvas,
                                   out_hws + 2 * i, orig_hws + 2 * i);
        failures += rc;
    }
    return failures;
}

}  // extern "C"
