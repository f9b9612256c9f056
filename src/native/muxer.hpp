/* Container muxer: wrap encoded elementary-stream packets into
 * MP4 / Matroska / MPEG-TS via libavformat.
 *
 * The reference emits raw elementary streams only (its tests feed them
 * straight back into PyDecoder); a muxer completes the transcode story
 * and lets the test suite synthesize container-level fixtures (e.g. true
 * variable-frame-rate clips, which no reference fixture provides —
 * /root/reference/tests/test_PyDecoder.py:1004 leaves the VFR-true
 * assertion commented out for lack of one).
 */
#pragma once

#include <string>

#include "common.hpp"

struct AVFormatContext;
struct AVStream;

namespace vali {

class Muxer {
 public:
  /// path decides the container unless format ("mp4", "matroska",
  /// "mpegts") is given. pts/dts are expressed in 1/timebase_den seconds.
  Muxer(const std::string& path, const std::string& codec, int width,
        int height, int timebase_den = 90000,
        const std::string& format = "", int fps_num = 0, int fps_den = 1,
        const OptMap& opts = {});
  ~Muxer();

  Muxer(const Muxer&) = delete;
  Muxer& operator=(const Muxer&) = delete;

  /// Write one encoded access unit. Annex-B input accepted for all
  /// containers (extradata is extracted from the first key packet for
  /// MP4/MKV global headers).
  Info WritePacket(const uint8_t* data, size_t size, int64_t pts,
                   int64_t dts, bool key, std::string& msg);

  /// Write the trailer and close the file. Idempotent.
  Info Close(std::string& msg);

  int TimebaseDen() const { return m_tb_den; }

 private:
  void ExtractExtradata(const uint8_t* data, size_t size);
  void ExtractAv1Extradata(const uint8_t* data, size_t size);

  AVFormatContext* m_ctx = nullptr;
  AVStream* m_stream = nullptr;
  bool m_header_written = false;
  bool m_closed = false;
  enum CodecKind { kAnnexB, kVp8, kVp9, kAv1 };
  CodecKind m_codec_kind = kAnnexB;
  bool m_is_hevc = false;
  int m_tb_den = 90000;
  OptMap m_opts;  // muxer AVOptions (e.g. movflags=faststart), applied
                  // at avformat_write_header
};

}  // namespace vali
