/* vali-tpu native engine: shared helpers.
 *
 * Host-side FFmpeg demux/decode/encode engine feeding the TPU pipeline.
 * Behavioral parity targets are cited per-class against the reference
 * (RomanArzumanyan/VALI) implementation; the code here is an independent,
 * from-scratch implementation for the TPU build.
 */
#pragma once

#include <chrono>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/dict.h>
#include <libavutil/display.h>
#include <libavutil/imgutils.h>
#include <libavutil/motion_vector.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

// Lazy dlopen shims for every libav call below (no hard link-time dep on
// FFmpeg; reference L0 LibraryLoader parity). Must come after the libav
// headers and before any code that calls them.
#include "av_runtime.hpp"

namespace vali {

// Mirrors vali_tpu.core.enums.TaskExecInfo (and the reference's
// TC_CORE.hpp:40-52 taxonomy). Values must stay in sync with the Python enum.
enum class Info : int {
  SUCCESS = 0,
  FAIL = 1,
  END_OF_STREAM = 2,
  MORE_DATA_NEEDED = 3,
  BIT_DEPTH_NOT_SUPPORTED = 4,
  INVALID_INPUT = 5,
  UNSUPPORTED_FMT_CONV_PARAMS = 6,
  NOT_SUPPORTED = 7,
  RES_CHANGE = 8,
  SRC_DST_SIZE_MISMATCH = 9,
  SRC_DST_FMT_MISMATCH = 10,
};

// Mirrors vali_tpu.core.enums.PixelFormat.
enum class PixFmt : int {
  UNDEFINED = 0,
  Y = 1,
  RGB = 2,
  NV12 = 3,
  YUV420 = 4,
  RGB_PLANAR = 5,
  BGR = 6,
  YUV444 = 7,
  RGB_32F = 8,
  RGB_32F_PLANAR = 9,
  YUV422 = 10,
  P10 = 11,
  P12 = 12,
  YUV444_10bit = 13,
  YUV420_10bit = 14,
  GRAY12 = 15,
};

inline std::string av_err_str(int err) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(err, buf, sizeof(buf));
  return std::string(buf);
}

inline void throw_on_av_error(int res, const std::string& msg) {
  if (res < 0) {
    throw std::runtime_error(msg + ": " + av_err_str(res));
  }
}

using OptMap = std::map<std::string, std::string>;

inline AVDictionary* dict_from_map(const OptMap& opts) {
  AVDictionary* d = nullptr;
  for (const auto& kv : opts) {
    int res = av_dict_set(&d, kv.first.c_str(), kv.second.c_str(), 0);
    if (res < 0) {
      av_dict_free(&d);
      throw_on_av_error(res, "Failed to set AVOption " + kv.first);
    }
  }
  return d;
}

// Wall-clock I/O watchdog registered as the AVFormatContext interrupt
// callback (parity: reference Utils.cpp:243-303 TimeoutHandler). Consumes
// "timeout"/"stimeout" option keys (milliseconds).
class TimeoutHandler {
 public:
  static constexpr unsigned long kDefaultTimeoutMs = 3000;

  explicit TimeoutHandler(OptMap& opts) {
    unsigned long ms = kDefaultTimeoutMs;
    for (const char* key : {"timeout", "stimeout"}) {
      auto it = opts.find(key);
      if (it != opts.end()) {
        try {
          ms = std::stoul(it->second);
        } catch (...) {
          // keep default, same as the reference's fallback
        }
        opts.erase(it);
      }
    }
    m_timeout = std::chrono::milliseconds(ms);
    Reset();
  }

  void Register(AVFormatContext* fmt_ctx) {
    fmt_ctx->interrupt_callback.opaque = this;
    fmt_ctx->interrupt_callback.callback = &TimeoutHandler::Check;
  }

  void Reset() { m_last = std::chrono::steady_clock::now(); }

  bool IsTimeout() const {
    auto diff = std::chrono::duration_cast<std::chrono::milliseconds>(
        std::chrono::steady_clock::now() - m_last);
    return diff > m_timeout;
  }

  static int Check(void* self) {
    return self && static_cast<TimeoutHandler*>(self)->IsTimeout();
  }

 private:
  std::chrono::milliseconds m_timeout;
  std::chrono::steady_clock::time_point m_last;
};

// VALI <-> FFmpeg pixel format mapping (parity: the switch in
// TaskDecodeFrame.cpp:868-902 and Utils.hpp enum maps).
inline PixFmt from_av_pix_fmt(AVPixelFormat f) {
  switch (f) {
    case AV_PIX_FMT_NV12: return PixFmt::NV12;
    case AV_PIX_FMT_YUVJ420P:
    case AV_PIX_FMT_YUV420P: return PixFmt::YUV420;
    case AV_PIX_FMT_YUVJ444P:
    case AV_PIX_FMT_YUV444P: return PixFmt::YUV444;
    case AV_PIX_FMT_YUVJ422P:
    case AV_PIX_FMT_YUV422P: return PixFmt::YUV422;
    case AV_PIX_FMT_YUV420P10: return PixFmt::YUV420_10bit;
    case AV_PIX_FMT_YUV444P10: return PixFmt::YUV444_10bit;
    case AV_PIX_FMT_YUV420P12: return PixFmt::P12;
    case AV_PIX_FMT_GRAY8: return PixFmt::Y;
    case AV_PIX_FMT_GRAY12LE: return PixFmt::GRAY12;
    case AV_PIX_FMT_P010: return PixFmt::P10;
#ifdef AV_PIX_FMT_P012
    case AV_PIX_FMT_P012: return PixFmt::P12;
#endif
    default: return PixFmt::UNDEFINED;
  }
}

inline AVPixelFormat to_av_pix_fmt(PixFmt f) {
  switch (f) {
    case PixFmt::Y: return AV_PIX_FMT_GRAY8;
    case PixFmt::GRAY12: return AV_PIX_FMT_GRAY12LE;
    case PixFmt::NV12: return AV_PIX_FMT_NV12;
    case PixFmt::YUV420: return AV_PIX_FMT_YUV420P;
    case PixFmt::YUV422: return AV_PIX_FMT_YUV422P;
    case PixFmt::YUV444: return AV_PIX_FMT_YUV444P;
    case PixFmt::YUV420_10bit: return AV_PIX_FMT_YUV420P10;
    case PixFmt::YUV444_10bit: return AV_PIX_FMT_YUV444P10;
    case PixFmt::P10: return AV_PIX_FMT_P010;
    case PixFmt::P12: return AV_PIX_FMT_YUV420P12;
    case PixFmt::RGB: return AV_PIX_FMT_RGB24;
    case PixFmt::BGR: return AV_PIX_FMT_BGR24;
    case PixFmt::RGB_PLANAR: return AV_PIX_FMT_GBRP;  // plane order fixed up
    default: return AV_PIX_FMT_NONE;
  }
}

// 0=BT_601, 1=BT_709, 2=UNSPEC (vali_tpu.core.enums.ColorSpace)
inline int from_av_color_space(AVColorSpace cs) {
  switch (cs) {
    case AVCOL_SPC_BT470BG:
    case AVCOL_SPC_SMPTE170M: return 0;
    case AVCOL_SPC_BT709: return 1;
    default: return 2;
  }
}

// 0=MPEG, 1=JPEG, 2=UDEF (vali_tpu.core.enums.ColorRange)
inline int from_av_color_range(AVColorRange cr) {
  switch (cr) {
    case AVCOL_RANGE_MPEG: return 0;
    case AVCOL_RANGE_JPEG: return 1;
    default: return 2;
  }
}

inline double rational_to_double(AVRational r) {
  return r.den ? static_cast<double>(r.num) / r.den : 0.0;
}

struct StreamParamsC {
  int width = 0;
  int height = 0;
  uint32_t fourcc = 0;
  int codec_id = 0;
  double fps = 0.0;
  double avg_fps = 0.0;
  double time_base = 0.0;
  int64_t start_time = 0;
  double start_time_sec = 0.0;
  double duration_sec = 0.0;
  int64_t bit_rate = 0;
  int64_t num_frames = 0;
  int profile = 0;
  int level = 0;
  int color_space = 2;
  int color_range = 2;
};

struct PacketDataC {
  int64_t pts = 0;
  int64_t dts = 0;
  int64_t pos = 0;
  int64_t bsl = 0;
  int64_t duration = 0;
  int64_t key = 0;
};

}  // namespace vali
