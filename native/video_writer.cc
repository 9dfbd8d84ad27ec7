// Native video output path for kandinsky5_tpu.
//
// The reference writes videos through torchvision's ffmpeg binding
// (/root/reference/kandinsky/t2v_pipeline.py:183-188). Here the frame
// path is native: RGB -> YUV420 (BT.601) colorspace conversion in C++
// and a y4m stream piped straight into an ffmpeg process (libx264,
// crf/fps configurable), so the Python side hands off raw frames with a
// single memcpy-free call. A .y4m fallback writes the raw stream when
// no encoder binary is available.
//
// Built as a shared library (see Makefile); bound via ctypes in
// kandinsky5_tpu/utils/native_video.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

struct Writer {
  FILE* pipe = nullptr;     // ffmpeg stdin (popen) or raw file
  bool is_pipe = false;
  int width = 0;
  int height = 0;
  std::string header_written;
};

// BT.601 full-range RGB -> YUV420 planar conversion for one frame.
void rgb_to_yuv420(const uint8_t* rgb, int w, int h, uint8_t* y_plane,
                   uint8_t* u_plane, uint8_t* v_plane) {
  for (int row = 0; row < h; ++row) {
    const uint8_t* src = rgb + static_cast<size_t>(row) * w * 3;
    uint8_t* y_out = y_plane + static_cast<size_t>(row) * w;
    for (int col = 0; col < w; ++col) {
      const int r = src[3 * col], g = src[3 * col + 1], b = src[3 * col + 2];
      y_out[col] =
          static_cast<uint8_t>(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16);
    }
  }
  const int cw = w / 2, ch = h / 2;
  for (int row = 0; row < ch; ++row) {
    uint8_t* u_out = u_plane + static_cast<size_t>(row) * cw;
    uint8_t* v_out = v_plane + static_cast<size_t>(row) * cw;
    for (int col = 0; col < cw; ++col) {
      // average the 2x2 block
      int r = 0, g = 0, b = 0;
      for (int dy = 0; dy < 2; ++dy) {
        const uint8_t* src =
            rgb + (static_cast<size_t>(2 * row + dy) * w + 2 * col) * 3;
        r += src[0] + src[3];
        g += src[1] + src[4];
        b += src[2] + src[5];
      }
      r >>= 2; g >>= 2; b >>= 2;
      u_out[col] =
          static_cast<uint8_t>(((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128);
      v_out[col] =
          static_cast<uint8_t>(((112 * r - 94 * g - 18 * b + 128) >> 8) + 128);
    }
  }
}

}  // namespace

extern "C" {

// Open a writer. If ffmpeg_exe is non-empty, frames are piped into
// ffmpeg producing `path` (mp4/x264, given crf); otherwise `path` is
// written as a raw .y4m stream.
void* vw_open(const char* path, const char* ffmpeg_exe, int w, int h,
              int fps, int crf) {
  auto* ctx = new Writer();
  ctx->width = w;
  ctx->height = h;
  if (ffmpeg_exe != nullptr && ffmpeg_exe[0] != '\0') {
    char cmd[4096];
    std::snprintf(cmd, sizeof(cmd),
                  "\"%s\" -y -loglevel error -f yuv4mpegpipe -i - "
                  "-c:v libx264 -crf %d -pix_fmt yuv420p \"%s\"",
                  ffmpeg_exe, crf, path);
    ctx->pipe = popen(cmd, "w");
    ctx->is_pipe = true;
  } else {
    ctx->pipe = std::fopen(path, "wb");
    ctx->is_pipe = false;
  }
  if (ctx->pipe == nullptr) {
    delete ctx;
    return nullptr;
  }
  std::fprintf(ctx->pipe, "YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n", w, h, fps);
  return ctx;
}

// Append n_frames frames of (h, w, 3) uint8 RGB. Returns 0 on success.
int vw_write_frames(void* handle, const uint8_t* rgb, int n_frames) {
  auto* ctx = static_cast<Writer*>(handle);
  const int w = ctx->width, h = ctx->height;
  const size_t y_size = static_cast<size_t>(w) * h;
  const size_t c_size = y_size / 4;
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(y_size + 2 * c_size));
  if (buf == nullptr) return 1;
  uint8_t* y_plane = buf;
  uint8_t* u_plane = buf + y_size;
  uint8_t* v_plane = buf + y_size + c_size;
  int rc = 0;
  for (int f = 0; f < n_frames && rc == 0; ++f) {
    rgb_to_yuv420(rgb + static_cast<size_t>(f) * y_size * 3, w, h, y_plane,
                  u_plane, v_plane);
    if (std::fputs("FRAME\n", ctx->pipe) < 0 ||
        std::fwrite(y_plane, 1, y_size, ctx->pipe) != y_size ||
        std::fwrite(u_plane, 1, c_size, ctx->pipe) != c_size ||
        std::fwrite(v_plane, 1, c_size, ctx->pipe) != c_size) {
      rc = 2;
    }
  }
  std::free(buf);
  return rc;
}

int vw_close(void* handle) {
  auto* ctx = static_cast<Writer*>(handle);
  int rc = 0;
  if (ctx->pipe != nullptr) {
    rc = ctx->is_pipe ? pclose(ctx->pipe) : std::fclose(ctx->pipe);
  }
  delete ctx;
  return rc;
}

}  // extern "C"
