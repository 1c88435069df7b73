// scat_tpu native runtime: image decode + fused affine preprocessing +
// threaded prefetch for the host input pipeline.
//
// The reference's input pipeline is per-sample PIL/cv2 in DataLoader
// worker processes (reference dataset/load_STB.py:252-294).  The
// TPU-native split keeps the *label math* on device (scat_tpu/data/
// preprocess.py) and gives the host side this C++ engine: libjpeg/libpng
// decode, a bilinear affine warp + [-1,1] normalize matching
// preprocess.affine_sample (output[y,x] = in[Minv @ (x,y)] with
// zero-fill out of bounds), and a thread-pool batch loader so decode
// overlaps the TPU step.  Exposed as a C ABI for ctypes (no pybind11 in
// the image).
//
// Build: native/build.sh -> libscat_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <atomic>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------
// Decode: PNG/JPEG file -> RGB8 buffer.  Returns 0 on success.
// Caller provides the expected (h, w); decode fails if the file
// disagrees (static shapes end to end).
// ---------------------------------------------------------------------

static int decode_png_file(const char* path, uint8_t* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr);
               fclose(fp); return -2; }
  // rows must be constructed BEFORE the setjmp point: a libpng longjmp
  // returns control here and the early return below must still run the
  // vector's destructor (an object constructed after setjmp would leak).
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int width = png_get_image_width(png, info);
  int height = png_get_image_height(png, info);
  if (width != w || height != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // strip alpha unconditionally: tRNS expansion above can ADD an alpha
  // channel to palette/RGB images whose original color_type carries no
  // alpha mask — without this the rows would be 4-wide and overflow the
  // 3-channel output buffer.
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != (size_t)width * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -5;  // unexpected channel layout
  }
  rows.resize(height);
  for (int y = 0; y < height; y++) rows[y] = out + (size_t)y * width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

static int decode_jpeg_file(const char* path, uint8_t* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != w || (int)cinfo.output_height != h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

int scat_decode_image(const char* path, uint8_t* out, int h, int w) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".png") == 0 ||
                strcmp(path + n - 4, ".PNG") == 0))
    return decode_png_file(path, out, h, w);
  return decode_jpeg_file(path, out, h, w);
}

// ---------------------------------------------------------------------
// Fused affine warp + normalize: matches preprocess.affine_sample.
// in:  [H, W, 3] uint8; Minv: row-major [2,3] mapping OUTPUT px (x,y)
// -> INPUT px; out: [oh, ow, 3] float32 in [-1, 1], zero-fill -> -1.
// ---------------------------------------------------------------------

void scat_affine_warp_u8(const uint8_t* in, int H, int W,
                         const float* Minv, float* out, int oh, int ow) {
  const float a = Minv[0], b = Minv[1], c = Minv[2];
  const float d = Minv[3], e = Minv[4], f = Minv[5];
  for (int y = 0; y < oh; y++) {
    for (int x = 0; x < ow; x++) {
      float sx = a * x + b * y + c;
      float sy = d * x + e * y + f;
      float x0f = floorf(sx), y0f = floorf(sy);
      int x0 = (int)x0f, y0 = (int)y0f;
      float fx = sx - x0f, fy = sy - y0f;
      float* o = out + ((size_t)y * ow + x) * 3;
      for (int ch = 0; ch < 3; ch++) {
        float v00 = 0, v01 = 0, v10 = 0, v11 = 0;
        if (y0 >= 0 && y0 < H) {
          if (x0 >= 0 && x0 < W)
            v00 = in[((size_t)y0 * W + x0) * 3 + ch];
          if (x0 + 1 >= 0 && x0 + 1 < W)
            v01 = in[((size_t)y0 * W + x0 + 1) * 3 + ch];
        }
        if (y0 + 1 >= 0 && y0 + 1 < H) {
          if (x0 >= 0 && x0 < W)
            v10 = in[((size_t)(y0 + 1) * W + x0) * 3 + ch];
          if (x0 + 1 >= 0 && x0 + 1 < W)
            v11 = in[((size_t)(y0 + 1) * W + x0 + 1) * 3 + ch];
        }
        float top = v00 * (1 - fx) + v01 * fx;
        float bot = v10 * (1 - fx) + v11 * fx;
        float px = top * (1 - fy) + bot * fy;   // [0, 255]
        o[ch] = px * (2.0f / 255.0f) - 1.0f;     // [-1, 1]
      }
    }
  }
}

// ---------------------------------------------------------------------
// Motion blur: 1D box kernel of length k along one axis, applied to the
// full frame BEFORE the warp (the reference blurs the frame then crops,
// load_STB.py:266-268 + dataset/utils.py:204-241 via cv2.filter2D).
// Anchor k/2 and REFLECT_101 borders match cv2.filter2D's defaults and
// the jnp formulation in stb.maybe_motion_blur.
// ---------------------------------------------------------------------

static void box_blur_1d_u8(uint8_t* img, int H, int W, int k, int axis) {
  if (k <= 1) return;
  const int anchor = k / 2;
  // The reference's k x k kernel holds its 1-D box at column/row
  // int((k-1)/2) while cv2.filter2D anchors at k/2
  // (load_STB.py:162-169): for EVEN k the correlation therefore also
  // samples the PERPENDICULAR axis at offset -1, translating the image
  // one pixel — pinned against the literal motion_blur in
  // tests/test_literal_data_utils.py and mirrored by
  // stb.maybe_motion_blur on the device path.
  const int perp_off = (k % 2 == 0) ? -1 : 0;
  const float inv = 1.0f / (float)k;
  const int len = (axis == 0) ? H : W;
  const int plen = (axis == 0) ? W : H;
  std::vector<uint8_t> tmp((size_t)H * W * 3);
  memcpy(tmp.data(), img, tmp.size());
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      // perpendicular source coordinate (reflect-101 at the border)
      int q = ((axis == 0) ? x : y) + perp_off;
      if (q < 0) q = -q;
      if (q >= plen) q = 2 * plen - 2 - q;
      float acc[3] = {0, 0, 0};
      for (int t = -anchor; t <= k - 1 - anchor; t++) {
        int p = (axis == 0) ? y + t : x + t;
        if (p < 0) p = -p;                       // REFLECT_101
        if (p >= len) p = 2 * len - 2 - p;
        const uint8_t* src = (axis == 0)
            ? tmp.data() + ((size_t)p * W + q) * 3
            : tmp.data() + ((size_t)q * W + p) * 3;
        acc[0] += src[0]; acc[1] += src[1]; acc[2] += src[2];
      }
      uint8_t* dst = img + ((size_t)y * W + x) * 3;
      for (int ch = 0; ch < 3; ch++)
        dst[ch] = (uint8_t)(acc[ch] * inv + 0.5f);
    }
  }
}

// ---------------------------------------------------------------------
// Threaded batch loader: decode + warp a batch of files concurrently.
// paths: N C-strings; Minv: [N, 6]; out: [N, oh, ow, 3] float32.
// status: [N] int (0 ok).  Returns number of failures.
// blur_ksize/blur_axis (nullable): per-image motion-blur params
// (ksize<=1 = none; axis 0 vertical, 1 horizontal).
// ---------------------------------------------------------------------

struct Pool {
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> tasks;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; i++) {
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [this] { return stop || !tasks.empty(); });
            if (stop && tasks.empty()) return;
            task = std::move(tasks.front());
            tasks.pop();
          }
          task();
        }
      });
    }
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu);
      tasks.push(std::move(f));
    }
    cv.notify_one();
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
};

static Pool* g_pool = nullptr;
static int g_pool_size = 0;
static std::mutex g_pool_mu;  // ctypes releases the GIL: callers race

static void init_pool_locked(int n_threads) {
  if (g_pool && g_pool_size == n_threads) return;
  // destroying a pool joins its workers, so in-flight tasks drain
  // before the swap; new submitters are excluded by g_pool_mu.
  delete g_pool;
  g_pool = new Pool(n_threads);
  g_pool_size = n_threads;
}

void scat_init_pool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  init_pool_locked(n_threads);
}

int scat_load_batch_aug(const char** paths, int n, int H, int W,
                        const float* Minv, float* out, int oh, int ow,
                        int* status, const int* blur_ksize,
                        const int* blur_axis) {
  Pool* pool;
  {
    std::lock_guard<std::mutex> lk(g_pool_mu);
    init_pool_locked(g_pool ? g_pool_size : 4);
    pool = g_pool;
  }
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; i++) {
    pool->submit([=, &remaining, &done_mu, &done_cv] {
      std::vector<uint8_t> buf((size_t)H * W * 3);
      int rc = scat_decode_image(paths[i], buf.data(), H, W);
      status[i] = rc;
      float* dst = out + (size_t)i * oh * ow * 3;
      if (rc == 0) {
        if (blur_ksize && blur_ksize[i] > 1)
          box_blur_1d_u8(buf.data(), H, W, blur_ksize[i],
                         blur_axis ? blur_axis[i] : 0);
        scat_affine_warp_u8(buf.data(), H, W, Minv + (size_t)i * 6,
                            dst, oh, ow);
      } else {
        // failed decode -> all -1 (matches the reference's empty-crop
        // convention; the validity mask drops it, train.py:143-150)
        for (size_t k = 0; k < (size_t)oh * ow * 3; k++) dst[k] = -1.0f;
      }
      // decrement under done_mu: otherwise the waiter can observe
      // remaining==0 via a spurious wake, return, and destroy the
      // stack-allocated mutex/cv while this worker still locks them.
      {
        std::lock_guard<std::mutex> lk(done_mu);
        remaining.fetch_sub(1);
        done_cv.notify_one();  // under the lock: the waiter cannot
        // destroy done_mu/done_cv until this scope releases it
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  int fails = 0;
  for (int i = 0; i < n; i++) fails += status[i] != 0;
  return fails;
}

int scat_load_batch(const char** paths, int n, int H, int W,
                    const float* Minv, float* out, int oh, int ow,
                    int* status) {
  return scat_load_batch_aug(paths, n, H, W, Minv, out, oh, ow, status,
                             nullptr, nullptr);
}

}  // extern "C"
