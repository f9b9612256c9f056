#include "frameconv.hpp"

namespace vali {

FrameConverter::FrameConverter(int width, int height, PixFmt src_fmt,
                               PixFmt dst_fmt)
    : m_width(width),
      m_height(height),
      m_src_fmt(src_fmt),
      m_dst_fmt(dst_fmt) {
  m_src_av = to_av_pix_fmt(src_fmt);
  m_dst_av = to_av_pix_fmt(dst_fmt);
  if (m_src_av == AV_PIX_FMT_NONE || m_dst_av == AV_PIX_FMT_NONE) {
    throw std::runtime_error("Unsupported frame conversion pair");
  }
  if (width <= 0 || height <= 0) {
    throw std::runtime_error("Invalid frame size");
  }
}

FrameConverter::~FrameConverter() {
  if (m_sws) sws_freeContext(m_sws);
}

size_t FrameConverter::SrcSize() const {
  int s = av_image_get_buffer_size(m_src_av, m_width, m_height, 1);
  return s > 0 ? static_cast<size_t>(s) : 0;
}

size_t FrameConverter::DstSize() const {
  int s = av_image_get_buffer_size(m_dst_av, m_width, m_height, 1);
  return s > 0 ? static_cast<size_t>(s) : 0;
}

// VALI RGB_PLANAR stores planes in R,G,B order; FFmpeg's planar RGB is GBRP
// (G,B,R). Swizzle plane pointers so no copy is needed.
static void fixup_planar_rgb(PixFmt fmt, AVPixelFormat av_fmt,
                             uint8_t* data[4]) {
  if (fmt == PixFmt::RGB_PLANAR && av_fmt == AV_PIX_FMT_GBRP) {
    uint8_t* r = data[0];
    uint8_t* g = data[1];
    uint8_t* b = data[2];
    data[0] = g;
    data[1] = b;
    data[2] = r;
  }
}

Info FrameConverter::Convert(const uint8_t* src, size_t src_size,
                             uint8_t* dst, size_t dst_size, int color_space,
                             int color_range, std::string& msg) {
  if (src_size < SrcSize() || dst_size < DstSize()) {
    msg = "Buffer size mismatch";
    return Info::SRC_DST_SIZE_MISMATCH;
  }

  m_sws = sws_getCachedContext(m_sws, m_width, m_height, m_src_av, m_width,
                               m_height, m_dst_av,
                               SWS_BILINEAR | SWS_FULL_CHR_H_INT | SWS_ACCURATE_RND, nullptr,
                               nullptr, nullptr);
  if (!m_sws) {
    msg = "Failed to create swscale context";
    return Info::FAIL;
  }

  if (color_space != m_last_cs || color_range != m_last_cr) {
    const int* coeffs = sws_getCoefficients(
        color_space == 1 ? SWS_CS_ITU709 : SWS_CS_ITU601);
    int full_range = color_range == 1 ? 1 : 0;
    int* inv_table;
    int* table;
    int src_range, dst_range, brightness, contrast, saturation;
    if (sws_getColorspaceDetails(m_sws, &inv_table, &src_range, &table,
                                 &dst_range, &brightness, &contrast,
                                 &saturation) >= 0) {
      sws_setColorspaceDetails(m_sws, coeffs, full_range, coeffs, full_range,
                               brightness, contrast, saturation);
    }
    m_last_cs = color_space;
    m_last_cr = color_range;
  }

  uint8_t* src_data[4] = {nullptr};
  int src_linesize[4] = {0};
  av_image_fill_arrays(src_data, src_linesize, src, m_src_av, m_width,
                       m_height, 1);
  fixup_planar_rgb(m_src_fmt, m_src_av, src_data);

  uint8_t* dst_data[4] = {nullptr};
  int dst_linesize[4] = {0};
  av_image_fill_arrays(dst_data, dst_linesize, dst, m_dst_av, m_width,
                       m_height, 1);
  fixup_planar_rgb(m_dst_fmt, m_dst_av, dst_data);

  int res = sws_scale(m_sws, src_data, src_linesize, 0, m_height, dst_data,
                      dst_linesize);
  if (res < 0) {
    msg = av_err_str(res);
    return Info::FAIL;
  }
  return Info::SUCCESS;
}

}  // namespace vali
