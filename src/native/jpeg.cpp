#include "jpeg.hpp"

#include <algorithm>
#include <csetjmp>
#include <cstring>

#include <jpeglib.h>

namespace vali {

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char message[JMSG_LENGTH_MAX];
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

JpegEncoder::JpegEncoder(int quality, PixFmt fmt)
    : m_quality(quality), m_fmt(fmt) {
  if (quality < 1 || quality > 100) {
    throw std::runtime_error("JPEG quality must be in [1, 100]");
  }
  switch (fmt) {
    case PixFmt::RGB:
    case PixFmt::BGR:
    case PixFmt::RGB_PLANAR:
    case PixFmt::Y:
    case PixFmt::YUV420:
    case PixFmt::YUV444:
      break;
    default:
      throw std::runtime_error("Unsupported JPEG input pixel format");
  }
}

Info JpegEncoder::Encode(const uint8_t* data, size_t size, int width,
                         int height, std::vector<uint8_t>& out,
                         std::string& msg) {
  const size_t wh = static_cast<size_t>(width) * height;
  const bool raw_yuv = (m_fmt == PixFmt::YUV420 || m_fmt == PixFmt::YUV444);
  const bool is420 = m_fmt == PixFmt::YUV420;

  // Validate sizes before any libjpeg state exists (an early return
  // after jpeg_create_compress would leak the compress object).
  if (m_fmt == PixFmt::Y) {
    if (size < wh) { msg = "buffer too small"; return Info::INVALID_INPUT; }
  } else if (raw_yuv) {
    size_t need = is420 ? wh * 3 / 2 : wh * 3;
    if (size < need) { msg = "buffer too small"; return Info::INVALID_INPUT; }
  } else {
    if (size < wh * 3) { msg = "buffer too small"; return Info::INVALID_INPUT; }
  }

  jpeg_compress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;

  unsigned char* outbuf = nullptr;
  unsigned long outsize = 0;

  // Everything with a destructor is constructed BEFORE setjmp: longjmp
  // must not jump over the initialization of non-trivially-destructible
  // locals (UB + leaks). After a longjmp these vectors are destroyed
  // normally when the error branch returns.
  const int mcu_rows = is420 ? 16 : 8;
  const int c_rows = 8;
  const int cw = is420 ? width / 2 : width;
  const int ch = is420 ? height / 2 : height;
  // jpeg_write_raw_data consumes width_in_blocks*DCTSIZE samples per
  // row; when the image width is not MCU-aligned, rows are staged into
  // padded buffers with the right edge replicated.
  const int y_mcu_w = is420 ? 16 : 8;
  const int ypad_w = (width + y_mcu_w - 1) / y_mcu_w * y_mcu_w;
  const int cpad_w = is420 ? ypad_w / 2 : ypad_w;
  const bool need_pad = raw_yuv && ypad_w != width;
  std::vector<JSAMPROW> y_rows(raw_yuv ? mcu_rows : 0);
  std::vector<JSAMPROW> u_rows(raw_yuv ? c_rows : 0);
  std::vector<JSAMPROW> v_rows(raw_yuv ? c_rows : 0);
  std::vector<uint8_t> y_pad, u_pad, v_pad;
  if (need_pad) {
    y_pad.resize(static_cast<size_t>(mcu_rows) * ypad_w);
    u_pad.resize(static_cast<size_t>(c_rows) * cpad_w);
    v_pad.resize(static_cast<size_t>(c_rows) * cpad_w);
  }
  std::vector<uint8_t> interleave_buf;
  if (m_fmt == PixFmt::RGB_PLANAR) {
    interleave_buf.resize(static_cast<size_t>(width) * 3);
  }
  std::vector<uint8_t> bgr_buf;
#ifndef JCS_EXTENSIONS
  if (m_fmt == PixFmt::BGR) bgr_buf.resize(static_cast<size_t>(width) * 3);
#endif

  if (setjmp(jerr.setjmp_buffer)) {
    msg = jerr.message;
    jpeg_destroy_compress(&cinfo);
    if (outbuf) free(outbuf);
    return Info::FAIL;
  }

  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &outbuf, &outsize);

  cinfo.image_width = width;
  cinfo.image_height = height;

  if (m_fmt == PixFmt::Y) {
    cinfo.input_components = 1;
    cinfo.in_color_space = JCS_GRAYSCALE;
  } else if (raw_yuv) {
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_YCbCr;
  } else {
    cinfo.input_components = 3;
#ifdef JCS_EXTENSIONS
    cinfo.in_color_space = (m_fmt == PixFmt::BGR) ? JCS_EXT_BGR : JCS_RGB;
#else
    cinfo.in_color_space = JCS_RGB;
#endif
  }

  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, m_quality, TRUE);

  if (raw_yuv) {
    cinfo.raw_data_in = TRUE;
    jpeg_set_colorspace(&cinfo, JCS_YCbCr);
    cinfo.comp_info[0].h_samp_factor = is420 ? 2 : 1;
    cinfo.comp_info[0].v_samp_factor = is420 ? 2 : 1;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;

    jpeg_start_compress(&cinfo, TRUE);

    const uint8_t* y_plane = data;
    const uint8_t* u_plane = data + wh;
    const uint8_t* v_plane = u_plane + static_cast<size_t>(cw) * ch;

    while (cinfo.next_scanline < cinfo.image_height) {
      unsigned base = cinfo.next_scanline;
      for (int r = 0; r < mcu_rows; r++) {
        unsigned row = base + r;
        if (row >= (unsigned)height) row = height - 1;
        const uint8_t* src = y_plane + static_cast<size_t>(row) * width;
        if (need_pad) {
          uint8_t* dst = y_pad.data() + static_cast<size_t>(r) * ypad_w;
          std::memcpy(dst, src, width);
          std::memset(dst + width, src[width - 1], ypad_w - width);
          y_rows[r] = dst;
        } else {
          y_rows[r] = const_cast<JSAMPROW>(src);
        }
      }
      unsigned cbase = is420 ? base / 2 : base;
      for (int r = 0; r < c_rows; r++) {
        unsigned row = cbase + r;
        if (row >= (unsigned)ch) row = ch - 1;
        const uint8_t* us = u_plane + static_cast<size_t>(row) * cw;
        const uint8_t* vs = v_plane + static_cast<size_t>(row) * cw;
        if (need_pad) {
          uint8_t* ud = u_pad.data() + static_cast<size_t>(r) * cpad_w;
          uint8_t* vd = v_pad.data() + static_cast<size_t>(r) * cpad_w;
          std::memcpy(ud, us, cw);
          std::memset(ud + cw, us[cw - 1], cpad_w - cw);
          std::memcpy(vd, vs, cw);
          std::memset(vd + cw, vs[cw - 1], cpad_w - cw);
          u_rows[r] = ud;
          v_rows[r] = vd;
        } else {
          u_rows[r] = const_cast<JSAMPROW>(us);
          v_rows[r] = const_cast<JSAMPROW>(vs);
        }
      }
      JSAMPARRAY planes[3] = {y_rows.data(), u_rows.data(), v_rows.data()};
      jpeg_write_raw_data(&cinfo, planes, mcu_rows);
    }
  } else {
    jpeg_start_compress(&cinfo, TRUE);

    const uint8_t* row_src = data;
    size_t row_stride = static_cast<size_t>(width) * cinfo.input_components;

    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row;
      size_t r = cinfo.next_scanline;
      if (m_fmt == PixFmt::RGB_PLANAR) {
        const uint8_t* rp = data + r * width;
        const uint8_t* gp = data + wh + r * width;
        const uint8_t* bp = data + 2 * wh + r * width;
        for (int c = 0; c < width; c++) {
          interleave_buf[3 * c] = rp[c];
          interleave_buf[3 * c + 1] = gp[c];
          interleave_buf[3 * c + 2] = bp[c];
        }
        row = interleave_buf.data();
      } else {
#ifndef JCS_EXTENSIONS
        if (m_fmt == PixFmt::BGR) {
          const uint8_t* src_row = row_src + r * row_stride;
          for (int c = 0; c < width; c++) {
            bgr_buf[3 * c] = src_row[3 * c + 2];
            bgr_buf[3 * c + 1] = src_row[3 * c + 1];
            bgr_buf[3 * c + 2] = src_row[3 * c];
          }
          row = bgr_buf.data();
        } else
#endif
        {
          row = const_cast<JSAMPROW>(row_src + r * row_stride);
        }
      }
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
  }

  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);

  out.assign(outbuf, outbuf + outsize);
  free(outbuf);
  return Info::SUCCESS;
}

}  // namespace vali

namespace vali {

Info jpeg_encode_coefficients(const int16_t* y, int y_bh, int y_bw,
                              const int16_t* cb, const int16_t* cr,
                              int c_bh, int c_bw, int width, int height,
                              bool subsample420, int quality,
                              std::vector<uint8_t>& out, std::string& msg) {
  jpeg_compress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;

  unsigned char* outbuf = nullptr;
  unsigned long outsize = 0;

  if (setjmp(jerr.setjmp_buffer)) {
    msg = jerr.message;
    jpeg_destroy_compress(&cinfo);
    if (outbuf) free(outbuf);
    return Info::FAIL;
  }

  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &outbuf, &outsize);

  const bool gray = (cb == nullptr || cr == nullptr);
  cinfo.image_width = width;
  cinfo.image_height = height;
  cinfo.input_components = gray ? 1 : 3;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_YCbCr;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_set_colorspace(&cinfo, gray ? JCS_GRAYSCALE : JCS_YCbCr);
  if (!gray) {
    cinfo.comp_info[0].h_samp_factor = subsample420 ? 2 : 1;
    cinfo.comp_info[0].v_samp_factor = subsample420 ? 2 : 1;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }

  // Component geometry: computed here the same way libjpeg's master
  // control will (jpeg_write_coefficients re-derives them from the image
  // dims + sampling factors).
  const int num_comps = cinfo.num_components;
  jvirt_barray_ptr coef_arrays[3] = {nullptr, nullptr, nullptr};
  const int16_t* srcs[3] = {y, cb, cr};
  int src_bh[3] = {y_bh, c_bh, c_bh};
  int src_bw[3] = {y_bw, c_bw, c_bw};

  // per-component block dims as libjpeg computes them
  int max_h = 1, max_v = 1;
  for (int c = 0; c < num_comps; c++) {
    max_h = std::max(max_h, cinfo.comp_info[c].h_samp_factor);
    max_v = std::max(max_v, cinfo.comp_info[c].v_samp_factor);
  }
  for (int c = 0; c < num_comps; c++) {
    jpeg_component_info* comp = &cinfo.comp_info[c];
    long wb = (static_cast<long>(width) * comp->h_samp_factor + 8L * max_h
               - 1) / (8L * max_h);
    long hb = (static_cast<long>(height) * comp->v_samp_factor + 8L * max_v
               - 1) / (8L * max_v);
    comp->width_in_blocks = static_cast<JDIMENSION>(wb);
    comp->height_in_blocks = static_cast<JDIMENSION>(hb);
    JDIMENSION awb = static_cast<JDIMENSION>(
        ((wb + comp->h_samp_factor - 1) / comp->h_samp_factor)
        * comp->h_samp_factor);
    JDIMENSION ahb = static_cast<JDIMENSION>(
        ((hb + comp->v_samp_factor - 1) / comp->v_samp_factor)
        * comp->v_samp_factor);
    coef_arrays[c] = (*cinfo.mem->request_virt_barray)(
        reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE, TRUE, awb, ahb,
        static_cast<JDIMENSION>(comp->v_samp_factor));
  }

  jpeg_write_coefficients(&cinfo, coef_arrays);

  for (int c = 0; c < num_comps; c++) {
    jpeg_component_info* comp = &cinfo.comp_info[c];
    const int16_t* src = srcs[c];
    // Fill every allocated (MCU-padded) block, clamping to the source
    // grid; dummy blocks replicate the edge block, which keeps the DC
    // predictor smooth.
    JDIMENSION awb = static_cast<JDIMENSION>(
        ((comp->width_in_blocks + comp->h_samp_factor - 1)
         / comp->h_samp_factor) * comp->h_samp_factor);
    JDIMENSION ahb = static_cast<JDIMENSION>(
        ((comp->height_in_blocks + comp->v_samp_factor - 1)
         / comp->v_samp_factor) * comp->v_samp_factor);
    for (JDIMENSION row = 0; row < ahb; row++) {
      JBLOCKARRAY buf = (*cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), coef_arrays[c], row, 1,
          TRUE);
      for (JDIMENSION col = 0; col < awb; col++) {
        int srow = std::min<int>(row, src_bh[c] - 1);
        int scol = std::min<int>(col, src_bw[c] - 1);
        const int16_t* block = src
            + (static_cast<size_t>(srow) * src_bw[c] + scol) * DCTSIZE2;
        for (int k = 0; k < DCTSIZE2; k++) {
          buf[0][col][k] = static_cast<JCOEF>(block[k]);
        }
      }
    }
  }

  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  out.assign(outbuf, outbuf + outsize);
  free(outbuf);
  return Info::SUCCESS;
}

}  // namespace vali
