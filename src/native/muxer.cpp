#include "muxer.hpp"

extern "C" {
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
}

#include <algorithm>
#include <cstring>
#include <stdexcept>

namespace vali {

namespace {

// First annex-B parameter-set run in a key access unit: for H.264 the
// SPS(7)/PPS(8) NALs, for HEVC VPS(32)/SPS(33)/PPS(34). libavformat's
// MP4/MKV muxers convert annex-B extradata to avcC/hvcC themselves.
size_t param_set_span(const uint8_t* data, size_t size, bool hevc) {
  size_t end = 0;
  size_t i = 0;
  while (i + 3 < size) {
    if (data[i] == 0 && data[i + 1] == 0 &&
        (data[i + 2] == 1 || (data[i + 2] == 0 && i + 4 < size &&
                              data[i + 3] == 1))) {
      size_t hdr = data[i + 2] == 1 ? 3 : 4;
      size_t nal_start = i + hdr;
      if (nal_start >= size) break;
      int type = hevc ? (data[nal_start] >> 1) & 0x3F
                      : data[nal_start] & 0x1F;
      bool is_param = hevc ? (type >= 32 && type <= 34)
                           : (type == 7 || type == 8);
      // find next start code to know where this NAL ends
      size_t j = nal_start;
      while (j + 3 < size &&
             !(data[j] == 0 && data[j + 1] == 0 &&
               (data[j + 2] == 1 ||
                (data[j + 2] == 0 && j + 4 < size && data[j + 3] == 1)))) {
        j++;
      }
      size_t nal_end = (j + 3 < size) ? j : size;
      if (is_param) {
        end = nal_end;
        i = j;
        continue;
      }
      if (end) break;  // param sets done, VCL data starts
      i = j;
      continue;
    }
    i++;
  }
  return end;
}

// True if the access unit contains an IDR (H.264 NAL 5) / IRAP (HEVC NAL
// 16..23) slice. Caller-supplied key flags are unreliable — x264/x265
// scenecut moves IDRs — and a wrong sync-sample table breaks seeking.
bool is_key_au(const uint8_t* data, size_t size, bool hevc) {
  size_t i = 0;
  while (i + 4 < size) {
    if (data[i] == 0 && data[i + 1] == 0 &&
        (data[i + 2] == 1 ||
         (data[i + 2] == 0 && data[i + 3] == 1))) {
      size_t nal_start = i + (data[i + 2] == 1 ? 3 : 4);
      if (nal_start >= size) break;
      int type = hevc ? (data[nal_start] >> 1) & 0x3F
                      : data[nal_start] & 0x1F;
      if (hevc ? (type >= 16 && type <= 23) : type == 5) return true;
      i = nal_start;
      continue;
    }
    i++;
  }
  return false;
}

}  // namespace

Muxer::Muxer(const std::string& path, const std::string& codec, int width,
             int height, int timebase_den, const std::string& format,
             int fps_num, int fps_den, const OptMap& opts)
    : m_tb_den(timebase_den), m_opts(opts) {
  std::string c = codec;
  std::transform(c.begin(), c.end(), c.begin(), ::tolower);
  m_is_hevc = (c == "hevc" || c == "h265");
  AVCodecID cid;
  if (m_is_hevc) {
    cid = AV_CODEC_ID_HEVC;
  } else if (c == "h264" || c == "avc") {
    cid = AV_CODEC_ID_H264;
  } else if (c == "vp9") {
    cid = AV_CODEC_ID_VP9;
    m_codec_kind = kVp9;
  } else if (c == "vp8") {
    cid = AV_CODEC_ID_VP8;
    m_codec_kind = kVp8;
  } else if (c == "av1") {
    cid = AV_CODEC_ID_AV1;
    m_codec_kind = kAv1;
  } else {
    throw std::runtime_error("Muxer: unsupported codec '" + codec + "'");
  }
  int res = avformat_alloc_output_context2(
      &m_ctx, nullptr, format.empty() ? nullptr : format.c_str(),
      path.c_str());
  if (res < 0 || !m_ctx) {
    throw std::runtime_error("Muxer: cannot deduce container for " + path +
                             ": " + av_err_str(res));
  }
  m_stream = avformat_new_stream(m_ctx, nullptr);
  if (!m_stream) {
    avformat_free_context(m_ctx);
    m_ctx = nullptr;
    throw std::runtime_error("Muxer: failed to create stream");
  }
  m_stream->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
  m_stream->codecpar->codec_id = cid;
  m_stream->codecpar->width = width;
  m_stream->codecpar->height = height;
  m_stream->time_base = {1, m_tb_den};
  if (fps_num > 0) {
    m_stream->avg_frame_rate = {fps_num, fps_den};
  }
  if (!(m_ctx->oformat->flags & AVFMT_NOFILE)) {
    res = avio_open(&m_ctx->pb, path.c_str(), AVIO_FLAG_WRITE);
    if (res < 0) {
      avformat_free_context(m_ctx);
      m_ctx = nullptr;
      throw std::runtime_error("Muxer: cannot open " + path + ": " +
                               av_err_str(res));
    }
  }
}

Muxer::~Muxer() {
  std::string msg;
  Close(msg);
}

void Muxer::ExtractAv1Extradata(const uint8_t* data, size_t size) {
  // Find the SEQUENCE_HEADER OBU in the first AU: MKV/MP4 AV1 muxing
  // requires it as codec-private data (ff_isom_write_av1c).
  size_t i = 0;
  while (i < size) {
    uint8_t hdr = data[i];
    if (hdr & 0x80) return;  // forbidden bit: bail
    int type = (hdr >> 3) & 0x0F;
    bool ext = hdr & 0x04, has_size = hdr & 0x02;
    size_t pos = i + 1 + (ext ? 1 : 0);
    if (!has_size || pos >= size) return;
    uint64_t obu_size = 0;
    int shift = 0;
    bool size_ok = false;
    while (pos < size) {  // leb128: the spec caps it at 8 bytes; a
                          // malformed run of continuation bytes would
                          // otherwise shift past 64 bits (UB)
      uint8_t b = data[pos++];
      obu_size |= static_cast<uint64_t>(b & 0x7F) << shift;
      shift += 7;
      if (!(b & 0x80)) {
        size_ok = true;
        break;
      }
      if (shift >= 56) return;  // > 8 leb128 bytes: malformed, bail
    }
    if (!size_ok) return;  // input ended mid-leb128
    size_t end = pos + obu_size;
    if (end > size) return;
    if (type == 1) {  // OBU_SEQUENCE_HEADER
      size_t span = end - i;
      uint8_t* ed = static_cast<uint8_t*>(
          av_mallocz(span + AV_INPUT_BUFFER_PADDING_SIZE));
      if (!ed) return;
      memcpy(ed, data + i, span);
      m_stream->codecpar->extradata = ed;
      m_stream->codecpar->extradata_size = static_cast<int>(span);
      return;
    }
    i = end;
  }
}

void Muxer::ExtractExtradata(const uint8_t* data, size_t size) {
  size_t span = param_set_span(data, size, m_is_hevc);
  if (!span) return;
  uint8_t* ed = static_cast<uint8_t*>(
      av_mallocz(span + AV_INPUT_BUFFER_PADDING_SIZE));
  if (!ed) return;
  memcpy(ed, data, span);
  m_stream->codecpar->extradata = ed;
  m_stream->codecpar->extradata_size = static_cast<int>(span);
}

Info Muxer::WritePacket(const uint8_t* data, size_t size, int64_t pts,
                        int64_t dts, bool key, std::string& msg) {
  if (m_closed || !m_ctx) {
    msg = "muxer is closed";
    return Info::FAIL;
  }
  if (!m_header_written) {
    // annex-B parameter-set extradata applies to H.264/HEVC only;
    // VP8/VP9/AV1 containers carry no (or codec-private OBU) extradata
    // and MKV/IVF-style muxers accept them without it
    if (m_codec_kind == kAnnexB && !m_stream->codecpar->extradata) {
      ExtractExtradata(data, size);
    }
    if (m_codec_kind == kAv1 && !m_stream->codecpar->extradata) {
      ExtractAv1Extradata(data, size);
    }
    AVDictionary* hopts = dict_from_map(m_opts);
    int res = avformat_write_header(m_ctx, &hopts);
    const AVDictionaryEntry* leftover =
        hopts ? av_dict_get(hopts, "", nullptr, AV_DICT_IGNORE_SUFFIX)
              : nullptr;
    if (res >= 0 && leftover) {
      // entries the muxer did not consume: typo'd or unsupported
      // options must not be silently dropped. The header IS written at
      // this point, so mark it as such: a retried WritePacket must not
      // call avformat_write_header a second time on the same context.
      m_header_written = true;
      msg = "unknown muxer option(s):";
      for (const AVDictionaryEntry* e = leftover; e;
           e = av_dict_get(hopts, "", e, AV_DICT_IGNORE_SUFFIX)) {
        msg += std::string(" ") + e->key;
      }
      av_dict_free(&hopts);
      return Info::INVALID_INPUT;
    }
    if (hopts) av_dict_free(&hopts);
    if (res < 0) {
      msg = "write_header: " + av_err_str(res);
      return Info::FAIL;
    }
    m_header_written = true;
  }
  AVPacket* pkt = av_packet_alloc();
  if (!pkt || av_new_packet(pkt, static_cast<int>(size)) < 0) {
    if (pkt) av_packet_free(&pkt);
    msg = "packet alloc failure";
    return Info::FAIL;
  }
  memcpy(pkt->data, data, size);
  pkt->stream_index = m_stream->index;
  pkt->pts = pts;
  pkt->dts = dts;
  bool detected_key = false;
  switch (m_codec_kind) {
    case kAnnexB:
      detected_key = is_key_au(data, size, m_is_hevc);
      break;
    case kVp8:
      // VP8 frame tag: bit 0 of byte 0 is frame_type (0 = key)
      detected_key = size > 0 && (data[0] & 0x01) == 0;
      break;
    case kVp9:
      // VP9 uncompressed header: frame_marker(2 bits) then
      // profile_low_bit, profile_high_bit. Profile 3 carries an extra
      // reserved bit, shifting show_existing_frame and frame_type down
      // one position (VP9 bitstream spec 6.2 uncompressed_header).
      if (size > 0) {
        uint8_t b0 = data[0];
        int profile = (((b0 >> 4) & 1) << 1) | ((b0 >> 5) & 1);
        uint8_t show_existing_mask = profile == 3 ? 0x04 : 0x08;
        uint8_t frame_type_mask = profile == 3 ? 0x02 : 0x04;
        detected_key = (b0 & show_existing_mask) == 0 &&
                       (b0 & frame_type_mask) == 0;
      }
      break;
    case kAv1:
      detected_key = false;  // OBU parsing out of scope: caller's flag
      break;
  }
  if (key || detected_key) pkt->flags |= AV_PKT_FLAG_KEY;
  AVRational src_tb = {1, m_tb_den};
  av_packet_rescale_ts(pkt, src_tb, m_stream->time_base);
  int res = av_interleaved_write_frame(m_ctx, pkt);
  av_packet_free(&pkt);
  if (res < 0) {
    msg = "write_frame: " + av_err_str(res);
    return Info::FAIL;
  }
  return Info::SUCCESS;
}

Info Muxer::Close(std::string& msg) {
  if (m_closed) return Info::SUCCESS;
  m_closed = true;
  Info out = Info::SUCCESS;
  if (m_ctx) {
    if (m_header_written) {
      int res = av_write_trailer(m_ctx);
      if (res < 0) {
        msg = "write_trailer: " + av_err_str(res);
        out = Info::FAIL;
      }
    }
    if (!(m_ctx->oformat->flags & AVFMT_NOFILE) && m_ctx->pb) {
      avio_closep(&m_ctx->pb);
    }
    avformat_free_context(m_ctx);
    m_ctx = nullptr;
  }
  return out;
}

}  // namespace vali
