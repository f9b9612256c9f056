/* Host JPEG encoder over libjpeg(-turbo).
 *
 * Parity target: reference TaskNvJpegEncode.cpp (nvJPEG batched encode with
 * per-context quality + input pixel format). On TPU systems the DCT could
 * move into a Pallas kernel later; entropy coding stays on host either way.
 */
#pragma once

#include "common.hpp"

namespace vali {

class JpegEncoder {
 public:
  /// quality: 1..100. fmt: RGB / BGR / RGB_PLANAR / Y / YUV420 / YUV444.
  JpegEncoder(int quality, PixFmt fmt);

  /// Encode one host-layout frame into a JPEG byte stream.
  Info Encode(const uint8_t* data, size_t size, int width, int height,
              std::vector<uint8_t>& out, std::string& msg);

  int Quality() const { return m_quality; }
  PixFmt Format() const { return m_fmt; }

 private:
  int m_quality;
  PixFmt m_fmt;
};

}  // namespace vali

namespace vali {

/// Write a JPEG from pre-computed quantized DCT coefficients (the TPU
/// handles CSC/subsample/DCT/quant; host does entropy coding only via
/// jpeg_write_coefficients — the jpegtran path).
/// y/cb/cr: [bh, bw, 64] int16 natural-order blocks (cb/cr null for gray).
Info jpeg_encode_coefficients(const int16_t* y, int y_bh, int y_bw,
                              const int16_t* cb, const int16_t* cr,
                              int c_bh, int c_bw, int width, int height,
                              bool subsample420, int quality,
                              std::vector<uint8_t>& out, std::string& msg);

}  // namespace vali
