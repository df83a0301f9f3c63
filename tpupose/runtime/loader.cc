// Threaded JPEG frame loader with a prefetch ring.
//
// Native data-loading runtime for the streaming pipeline: the reference
// blocks the GPU on sequential cv2.imread calls per view
// (`src/dataset.py:36-45`); here worker threads decode frames ahead into a
// bounded ring so host decode overlaps device compute. C ABI for ctypes.
#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

struct Frame {
  int64_t index = -1;
  int width = 0, height = 0;
  bool ok = false;
  std::vector<uint8_t> data;  // concatenated views, each w*h*3
};

// Decode one JPEG straight into its slot of the frame's concatenated
// buffer (no intermediate per-view vector — the extra ~2.7 MB copy +
// realloc churn per 720p view measurably cost vs PIL). View 0 learns the
// frame dimensions and sizes the buffer for all `n_views`; later views
// must match (the consumer reshapes the buffer as (views, h, w, 3), so a
// silent mismatch would misalign every later view's pixels).
bool decode_view(const std::string& path, Frame* fr, int view, int n_views) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
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
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  if (view == 0) {
    fr->width = w;
    fr->height = h;
    fr->data.resize(static_cast<size_t>(n_views) * w * h * 3);
  } else if (w != fr->width || h != fr->height) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  uint8_t* base = fr->data.data() + static_cast<size_t>(view) * h * stride;
  // Hand libjpeg a window of row pointers per call instead of one row at
  // a time (it consumes up to rec_outbuf_height rows per call).
  JSAMPROW rows[16];
  while (cinfo.output_scanline < cinfo.output_height) {
    const JDIMENSION n =
        std::min<JDIMENSION>(16, cinfo.output_height - cinfo.output_scanline);
    for (JDIMENSION i = 0; i < n; ++i) {
      rows[i] = base + (cinfo.output_scanline + i) * stride;
    }
    jpeg_read_scanlines(&cinfo, rows, n);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

struct Loader {
  std::vector<std::vector<std::string>> frames;  // [frame][view] paths
  size_t prefetch = 4;
  int num_threads = 2;

  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::queue<Frame> ready;       // decoded frames, emitted in index order
  std::atomic<int64_t> next_to_decode{0};
  int64_t next_to_emit = 0;      // next index to move stash -> ready
  int64_t consumed = 0;          // frames handed to the caller
  std::vector<Frame> stash;      // out-of-order completions
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  // Observability: where worker wall time went (ns) — actual decode vs
  // blocked on the credit window (consumer behind). Lets the host tell
  // "workers are slow" from "workers are idle" when decode_wait rises.
  std::atomic<int64_t> decode_ns{0}, credit_wait_ns{0}, frames_done{0};

  void worker() {
    using clock = std::chrono::steady_clock;
    for (;;) {
      const int64_t idx = next_to_decode.fetch_add(1);
      if (idx >= static_cast<int64_t>(frames.size())) return;
      {
        // Credit window: decode at most `prefetch` frames ahead of the
        // consumer (bounds memory; stash size is bounded by the window).
        const auto w0 = clock::now();
        std::unique_lock<std::mutex> lock(mu);
        cv_produce.wait(lock, [&] {
          return stop.load() ||
                 idx < consumed + static_cast<int64_t>(prefetch);
        });
        credit_wait_ns.fetch_add(
            std::chrono::duration_cast<std::chrono::nanoseconds>(
                clock::now() - w0).count());
        if (stop.load()) return;
      }
      Frame fr;
      fr.index = idx;
      fr.ok = true;
      const auto d0 = clock::now();
      const int n_views = static_cast<int>(frames[idx].size());
      for (int v = 0; v < n_views; ++v) {
        if (!decode_view(frames[idx][v], &fr, v, n_views)) {
          fr.ok = false;  // missing, corrupt, or dimension-mismatched file
          break;
        }
      }
      decode_ns.fetch_add(
          std::chrono::duration_cast<std::chrono::nanoseconds>(
              clock::now() - d0).count());
      frames_done.fetch_add(1);
      std::unique_lock<std::mutex> lock(mu);
      stash.push_back(std::move(fr));
      // Promote in-order frames from the stash to the ready queue.
      bool moved = true;
      while (moved) {
        moved = false;
        for (size_t i = 0; i < stash.size(); ++i) {
          if (stash[i].index == next_to_emit) {
            ready.push(std::move(stash[i]));
            stash.erase(stash.begin() + i);
            ++next_to_emit;
            moved = true;
            break;
          }
        }
      }
      cv_consume.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// paths: flat array of n_frames * n_views C strings.
void* tpupose_loader_create(const char** paths, int64_t n_frames,
                            int32_t n_views, int32_t prefetch,
                            int32_t n_threads) {
  auto* l = new Loader();
  l->frames.resize(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) {
    for (int32_t v = 0; v < n_views; ++v) {
      l->frames[i].emplace_back(paths[i * n_views + v]);
    }
  }
  l->prefetch = prefetch > 0 ? prefetch : 4;
  l->num_threads = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < l->num_threads; ++t) {
    l->workers.emplace_back([l] { l->worker(); });
  }
  return l;
}

// Copies the next decoded frame (all views) into out (size n_views*h*w*3).
// Returns 1 on success, 0 at end of stream, -1 on decode error.
int32_t tpupose_loader_next(void* handle, uint8_t* out, int64_t out_size,
                            int32_t* width, int32_t* height) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(l->mu);
  if (l->consumed >= static_cast<int64_t>(l->frames.size())) {
    return 0;  // end of stream
  }
  l->cv_consume.wait(lock, [&] { return !l->ready.empty(); });
  Frame fr = std::move(l->ready.front());
  l->ready.pop();
  ++l->consumed;
  l->cv_produce.notify_all();
  lock.unlock();
  if (!fr.ok) return -1;
  if (static_cast<int64_t>(fr.data.size()) > out_size) return -1;
  std::memcpy(out, fr.data.data(), fr.data.size());
  *width = fr.width;
  *height = fr.height;
  return 1;
}

int64_t tpupose_loader_total(void* handle) {
  return static_cast<Loader*>(handle)->frames.size();
}

// Worker time breakdown: decode wall-ns, credit-window wait ns, frames
// decoded so far (all workers summed).
void tpupose_loader_stats(void* handle, int64_t* decode_ns,
                          int64_t* credit_wait_ns, int64_t* frames_done) {
  auto* l = static_cast<Loader*>(handle);
  *decode_ns = l->decode_ns.load();
  *credit_wait_ns = l->credit_wait_ns.load();
  *frames_done = l->frames_done.load();
}

void tpupose_loader_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv_produce.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
