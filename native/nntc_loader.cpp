// Native data-loader core: JPEG decoding + batch packing.
//
// The reference delegates its hot host-side work (JPEG decode, warps) to
// OpenCV; in this framework the warps run on the TPU and the host is left
// with decode + packing, which this library implements natively on libjpeg
// with a worker pool. Exposed through a plain C ABI for ctypes (pybind11 is
// not available in the image).
//
// Grayscale decodes use libjpeg's JCS_GRAYSCALE output, which skips the
// chroma components entirely instead of decoding RGB and converting.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode into a destination with arbitrary row stride (e.g. a padded batch
// slot). Returns 0 on success.
int decode_into(const uint8_t* buf, size_t len, uint8_t* out, int out_stride,
                int max_h, int max_w, int channels, int* height, int* width) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  if (w > max_w || h > max_h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;  // destination too small
  }
  *width = w;
  *height = h;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * out_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Minimal worker pool (persistent; created lazily).
class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lock(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> f) {
    {
      std::unique_lock<std::mutex> lock(m_);
      queue_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lock(m_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = std::move(queue_.front());
        queue_.pop();
      }
      task();
    }
  }
  std::mutex m_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> queue_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* g_pool = nullptr;
std::mutex g_pool_mutex;
int g_pool_size = 0;

Pool* pool(int nthreads) {
  std::lock_guard<std::mutex> lock(g_pool_mutex);
  if (g_pool == nullptr || g_pool_size != nthreads) {
    delete g_pool;
    g_pool = new Pool(nthreads);
    g_pool_size = nthreads;
  }
  return g_pool;
}

}  // namespace

extern "C" {

// Decode one JPEG; out must hold max_h*max_w*channels bytes (row stride
// max_w*channels). Returns 0 ok, 1 decode error, 2 too large.
int nntc_decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out, int max_h,
                     int max_w, int channels, int* height, int* width) {
  return decode_into(buf, len, out, max_w * channels, max_h, max_w, channels,
                     height, width);
}

// Decode n JPEGs into a zero-initialized (n, pad, pad, 1) batch (each image
// lands top-left in its slot). offsets[i]/lengths[i] index into blob.
// heights/widths receive per-image dimensions. Parallel over nthreads.
// Returns the number of failed decodes.
int nntc_pack_batch_gray(const uint8_t* blob, const size_t* offsets,
                         const size_t* lengths, int n, uint8_t* out, int pad,
                         int* heights, int* widths, int nthreads) {
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex done_m;
  std::condition_variable done_cv;
  const size_t slot = static_cast<size_t>(pad) * pad;
  Pool* p = nthreads > 1 ? pool(nthreads) : nullptr;

  auto work = [&](int i) {
    int rc = decode_into(blob + offsets[i], lengths[i], out + slot * i, pad,
                         pad, pad, 1, heights + i, widths + i);
    if (rc != 0) {
      failures.fetch_add(1);
      heights[i] = widths[i] = 0;
    }
    if (remaining.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lock(done_m);
      done_cv.notify_one();
    }
  };

  if (p == nullptr) {
    for (int i = 0; i < n; ++i) work(i);
  } else {
    for (int i = 0; i < n; ++i) {
      p->Submit([&, i] { work(i); });
    }
    std::unique_lock<std::mutex> lock(done_m);
    done_cv.wait(lock, [&] { return remaining.load() == 0; });
  }
  return failures.load();
}

}  // extern "C"
