/* CPU frame converter over libswscale.
 *
 * Parity target: reference TaskConvertFrame.cpp:11-112 (sws_scale +
 * sws_setColorspaceDetails honoring colorspace/range).
 */
#pragma once

#include "common.hpp"

namespace vali {

class FrameConverter {
 public:
  FrameConverter(int width, int height, PixFmt src_fmt, PixFmt dst_fmt);
  ~FrameConverter();

  FrameConverter(const FrameConverter&) = delete;
  FrameConverter& operator=(const FrameConverter&) = delete;

  /// Convert one host-layout frame. cc: color space id (0=601,1=709,2=unspec)
  /// and range id (0=MPEG,1=JPEG,2=UDEF).
  Info Convert(const uint8_t* src, size_t src_size, uint8_t* dst,
               size_t dst_size, int color_space, int color_range,
               std::string& msg);

  size_t SrcSize() const;
  size_t DstSize() const;
  PixFmt DstFormat() const { return m_dst_fmt; }

 private:
  int m_width;
  int m_height;
  PixFmt m_src_fmt;
  PixFmt m_dst_fmt;
  AVPixelFormat m_src_av;
  AVPixelFormat m_dst_av;
  SwsContext* m_sws = nullptr;
  int m_last_cs = -1;
  int m_last_cr = -1;
};

}  // namespace vali
