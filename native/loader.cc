// Native JPEG decode pool for the peclr_tpu input pipeline.
//
// The reference delegates JPEG decode to libjpeg via OpenCV inside Python
// DataLoader worker processes (SURVEY §2.4).  Here decode is a C++ thread
// pool over libjpeg directly: no Python object churn, no per-sample GIL
// round trips, and batch output written straight into the caller's pinned
// canvas buffer so the host->device DMA can start immediately.
//
// Exposed C ABI (ctypes-bound in peclr_tpu/data/native_loader.py):
//   peclr_decode_jpeg  — single file -> RGB8 buffer
//   peclr_decode_batch — N files -> (N, canvas, canvas, 3) canvas batch,
//                        decoded by `threads` workers; frames are
//                        center-fitted (nearest resize) if sizes differ.

#include <cstdio>  // must precede jpeglib.h (it uses FILE unqualified)

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> data;
  int h = 0;
  int w = 0;
};

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  // Replace the default error_exit (which calls exit()) with longjmp-free
  // failure: mark and bail via the return path.
  struct ErrorGuard {
    jmp_buf jb;
  };
  static thread_local ErrorGuard guard;
  jerr.error_exit = [](j_common_ptr c) {
    (void)c;
    longjmp(guard.jb, 1);
  };
  if (setjmp(guard.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->h = static_cast<int>(cinfo.output_height);
  out->w = static_cast<int>(cinfo.output_width);
  out->data.resize(static_cast<size_t>(out->h) * out->w * 3);

  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Nearest-neighbor fit of `src` into a square canvas (used only when the
// source frame is not already canvas-sized).
void fit_to_canvas(const Image& src, unsigned char* dst, int canvas) {
  if (src.h == canvas && src.w == canvas) {
    std::memcpy(dst, src.data.data(), static_cast<size_t>(canvas) * canvas * 3);
    return;
  }
  for (int y = 0; y < canvas; ++y) {
    const int sy = static_cast<int>(static_cast<long long>(y) * src.h / canvas);
    for (int x = 0; x < canvas; ++x) {
      const int sx = static_cast<int>(static_cast<long long>(x) * src.w / canvas);
      const unsigned char* p =
          src.data.data() + (static_cast<size_t>(sy) * src.w + sx) * 3;
      unsigned char* q = dst + (static_cast<size_t>(y) * canvas + x) * 3;
      q[0] = p[0];
      q[1] = p[1];
      q[2] = p[2];
    }
  }
}

}  // namespace

extern "C" {

// Decode one JPEG into caller buffer (capacity bytes).  Returns 0 on
// success; fills *out_h / *out_w.
int peclr_decode_jpeg(const char* path, unsigned char* out, int capacity,
                      int* out_h, int* out_w) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  const long long need = static_cast<long long>(img.h) * img.w * 3;
  if (need > capacity) return 2;
  std::memcpy(out, img.data.data(), static_cast<size_t>(need));
  *out_h = img.h;
  *out_w = img.w;
  return 0;
}

// Decode `count` JPEGs into a (count, canvas, canvas, 3) uint8 buffer with
// `threads` worker threads.  Returns the number of failed decodes.
int peclr_decode_batch(const char** paths, int count, unsigned char* out,
                       int canvas, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  const size_t frame = static_cast<size_t>(canvas) * canvas * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= count) return;
      Image img;
      if (!decode_file(paths[i], &img)) {
        failures.fetch_add(1);
        std::memset(out + frame * i, 0, frame);
        continue;
      }
      fit_to_canvas(img, out + frame * i, canvas);
    }
  };

  std::vector<std::thread> pool;
  const int n = threads < count ? threads : count;
  pool.reserve(n);
  for (int t = 0; t < n; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
