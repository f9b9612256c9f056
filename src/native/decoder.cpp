#include "decoder.hpp"

#include <algorithm>
#include <array>
#include <cstring>
#include <iostream>
#include <sstream>

namespace vali {

VideoDecoder::VideoDecoder(const char* url, OptMap opts, const IoHooks* io,
                           bool probe) {
  // "preferred_width" is a VALI option, not an FFmpeg one (parity:
  // TaskDecodeFrame.cpp:198-203) — used for HLS ABR stream selection.
  auto it = opts.find("preferred_width");
  if (it != opts.end()) {
    m_preferred_width = std::stoi(it->second);
    opts.erase(it);
  }

  m_timeout.reset(new TimeoutHandler(opts));

  AVFormatContext* fmt_ctx = avformat_alloc_context();
  if (!fmt_ctx) throw std::runtime_error("Failed to allocate format context");
  m_timeout->Register(fmt_ctx);

  if (io && io->read) {
    auto* buf = static_cast<unsigned char*>(av_malloc(io->buffer_size));
    if (!buf) {
      avformat_free_context(fmt_ctx);
      throw std::bad_alloc();
    }
    m_io_ctx = avio_alloc_context(buf, io->buffer_size, 0, io->opaque,
                                  io->read, nullptr,
                                  io->seekable ? io->seek : nullptr);
    if (!m_io_ctx) {
      av_free(buf);
      avformat_free_context(fmt_ctx);
      throw std::bad_alloc();
    }
    m_custom_io_seekable = io->seekable;
    fmt_ctx->pb = m_io_ctx;
    fmt_ctx->flags |= AVFMT_FLAG_CUSTOM_IO;

    /* Probe the input format from the first KB ourselves so libavformat
     * doesn't burn through the custom-IO buffer (parity:
     * TaskDecodeFrame.cpp:211-233). Only possible when we can rewind. */
    if (m_custom_io_seekable) {
      // probers may read buf_size + AVPROBE_PADDING_SIZE bytes; the
      // tail must exist and stay zeroed (the reference overreads here,
      // TaskDecodeFrame.cpp:219-231 — UB we don't copy)
      std::array<uint8_t, 1024 + AVPROBE_PADDING_SIZE> probe_buf{};
      int nbytes = io->read(io->opaque, probe_buf.data(), 1024);
      io->seek(io->opaque, 0, SEEK_SET);
      if (nbytes > 0) {
        AVProbeData pd = {};
        pd.buf = probe_buf.data();
        pd.buf_size = nbytes;
        pd.filename = "";
        fmt_ctx->iformat = av_probe_input_format(&pd, 1);
      }
    }
  }

  m_options = dict_from_map(opts);

  AVDictionary* open_opts = nullptr;
  av_dict_copy(&open_opts, m_options, 0);
  m_timeout->Reset();
  int res = avformat_open_input(&fmt_ctx, m_io_ctx ? "" : url, nullptr,
                                &open_opts);
  if (open_opts) av_dict_free(&open_opts);
  if (res < 0) {
    // fmt_ctx is freed by avformat_open_input on failure; the custom IO
    // context stays caller-owned (AVFMT_FLAG_CUSTOM_IO) so free it here.
    if (m_io_ctx) {
      av_freep(&m_io_ctx->buffer);
      avio_context_free(&m_io_ctx);
    }
    if (m_options) av_dict_free(&m_options);
    throw std::runtime_error("Can't open source " + std::string(url ? url : "")
                             + ": " + av_err_str(res));
  }
  m_fmt_ctx = fmt_ctx;

  try {
  m_timeout->Reset();
  res = avformat_find_stream_info(m_fmt_ctx, nullptr);
  throw_on_av_error(res, "Can't find stream information");

  int wanted = -1;
  if (m_preferred_width > 0) {
    for (unsigned i = 0; i < m_fmt_ctx->nb_streams; i++) {
      if (m_fmt_ctx->streams[i]->codecpar->width == m_preferred_width) {
        wanted = static_cast<int>(i);
        break;
      }
    }
  }
  m_timeout->Reset();
  m_stream_idx = av_find_best_stream(m_fmt_ctx, AVMEDIA_TYPE_VIDEO, wanted,
                                     -1, nullptr, 0);
  if (m_stream_idx < 0) {
    throw std::runtime_error("Could not find video stream in input " +
                             std::string(url ? url : ""));
  }

  if (probe) return;

  OpenCodec();

  m_frame = av_frame_alloc();
  if (!m_frame) throw std::runtime_error("Failed to allocate frame");
  } catch (...) {
    // Destructors don't run when a constructor throws: release everything
    // acquired so far before propagating.
    if (m_frame) av_frame_free(&m_frame);
    if (m_avc_ctx) avcodec_free_context(&m_avc_ctx);
    if (m_fmt_ctx) avformat_close_input(&m_fmt_ctx);
    if (m_io_ctx) {
      av_freep(&m_io_ctx->buffer);
      avio_context_free(&m_io_ctx);
    }
    if (m_options) av_dict_free(&m_options);
    throw;
  }
}

VideoDecoder::~VideoDecoder() {
  while (!m_pkt_queue.empty()) {
    AVPacket* p = m_pkt_queue.front();
    m_pkt_queue.pop();
    av_packet_free(&p);
  }
  if (m_frame) av_frame_free(&m_frame);
  if (m_avc_ctx) avcodec_free_context(&m_avc_ctx);
  if (m_fmt_ctx) avformat_close_input(&m_fmt_ctx);
  if (m_io_ctx) {
    av_freep(&m_io_ctx->buffer);
    avio_context_free(&m_io_ctx);
  }
  if (m_options) av_dict_free(&m_options);
}

AVStream* VideoDecoder::VideoStream() const {
  return m_fmt_ctx->streams[m_stream_idx];
}

void VideoDecoder::OpenCodec() {
  AVStream* stream = VideoStream();
  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  if (!codec) {
    throw std::runtime_error(
        std::string("Failed to find decoder: ") +
        avcodec_get_name(stream->codecpar->codec_id));
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) throw std::runtime_error("Failed to allocate codec context");
  m_avc_ctx = ctx;

  int res = avcodec_parameters_to_context(m_avc_ctx, stream->codecpar);
  throw_on_av_error(res, "Failed to apply codec parameters");

  /* Packet timebase must be set before open, otherwise libavcodec can't
   * reconstruct PTS values (parity: TaskDecodeFrame.cpp:441-446). */
  m_avc_ctx->pkt_timebase = stream->time_base;

  /* Default to auto threading (libavcodec's default is single-threaded);
   * a user-supplied "threads" AVOption still overrides via the dict. */
  if (!av_dict_get(m_options, "threads", nullptr, 0)) {
    m_avc_ctx->thread_count = 0;
  }

  AVDictionary* copts = nullptr;
  av_dict_copy(&copts, m_options, 0);
  res = avcodec_open2(m_avc_ctx, codec, &copts);
  if (copts) av_dict_free(&copts);
  throw_on_av_error(res, "Failed to open codec");
  m_codec_open = true;
}

void VideoDecoder::CloseCodec() {
  if (m_avc_ctx) avcodec_free_context(&m_avc_ctx);
  m_codec_open = false;
}

int VideoDecoder::Width() const {
  if (m_frame && m_frame->width > 0) return m_frame->width;
  return m_avc_ctx ? m_avc_ctx->width : VideoStream()->codecpar->width;
}

int VideoDecoder::Height() const {
  if (m_frame && m_frame->height > 0) return m_frame->height;
  return m_avc_ctx ? m_avc_ctx->height : VideoStream()->codecpar->height;
}

void VideoDecoder::SaveCurrentRes() {
  m_last_w = Width();
  m_last_h = Height();
}

VideoDecoder::Status VideoDecoder::ReadPacket() {
  while (!m_eof) {
    AVPacket* pkt = av_packet_alloc();
    if (!pkt) {
      m_end_decode = true;
      return ST_ERROR;
    }
    m_timeout->Reset();
    int ret = av_read_frame(m_fmt_ctx, pkt);
    if (AVERROR_EOF == ret) {
      av_packet_free(&pkt);
      m_eof = true;
      break;
    } else if (ret < 0) {
      av_packet_free(&pkt);
      m_end_decode = true;
      return ST_ERROR;
    }

    m_num_pkt_read++;
    bool is_video = pkt->stream_index == m_stream_idx;
    bool is_key = pkt->flags & AV_PKT_FLAG_KEY;
    bool wanted = (m_mode == 1) ? (is_video && is_key) : is_video;
    if (wanted) {
      m_pkt_queue.push(pkt);
      break;
    }
    av_packet_free(&pkt);
  }
  return ST_SUCCESS;
}

VideoDecoder::Status VideoDecoder::SendPacket() {
  if (m_noacpt) return ST_SUCCESS;

  int res = 0;
  bool pop = false;
  if (!m_pkt_queue.empty()) {
    res = avcodec_send_packet(m_avc_ctx, m_pkt_queue.front());
    pop = true;
  } else if (m_eof) {
    res = avcodec_send_packet(m_avc_ctx, nullptr);
  } else {
    return ST_ERROR;
  }

  if (AVERROR_EOF == res) {
    // not an error: flushing already-finished decoder
  } else if (AVERROR(EAGAIN) == res) {
    /* Decoder can't accept packets in its current state (e.g. around a
     * resolution change); drain frames first (parity: m_noacpt
     * backpressure, TaskDecodeFrame.cpp:690-724). */
    m_noacpt = true;
  } else if (res < 0) {
    return ST_ERROR;
  } else if (pop) {
    m_num_pkt_sent++;
    AVPacket* p = m_pkt_queue.front();
    m_pkt_queue.pop();
    av_packet_free(&p);
  }
  return ST_SUCCESS;
}

VideoDecoder::Status VideoDecoder::ReceiveFrame() {
  SaveCurrentRes();
  int res = avcodec_receive_frame(m_avc_ctx, m_frame);
  if (AVERROR_EOF == res) {
    return ST_EOS;
  } else if (AVERROR(EAGAIN) == res) {
    if (m_noacpt) m_noacpt = false;
    return ST_MORE;
  } else if (res < 0) {
    return ST_ERROR;
  }
  m_num_frm_recv++;

  bool res_change = (m_last_w > 0) &&
                    ((m_last_w != Width()) || (m_last_h != Height()));
  m_res_change = res_change;
  if (res_change) return ST_RES_CHANGE;

  SaveSideData();
  SavePacketData();
  return ST_SUCCESS;
}

Info VideoDecoder::DecodeNext(std::string& msg) {
  /* Resolution-change stash protocol (parity: DecodeFrame::Run,
   * TaskDecodeFrame.cpp:1043-1054): the frame that changed resolution was
   * decoded but not delivered; deliver it now that the caller has
   * re-allocated its buffers. */
  if (m_res_change) {
    m_res_change = false;
    SaveSideData();
    SavePacketData();
    return Info::SUCCESS;
  }

  if (!m_codec_open || !m_frame) {
    msg = "decoder not open (probe-only instance?)";
    return Info::FAIL;
  }
  if (m_end_decode) {
    msg = "decode finished";
    return Info::FAIL;
  }

  while (true) {
    Status status = ST_SUCCESS;
    do {
      status = ReadPacket();
      if (status != ST_SUCCESS) break;
      status = SendPacket();
      if (status != ST_SUCCESS) break;
      status = ReceiveFrame();
    } while (false);

    switch (status) {
      case ST_SUCCESS:
        return Info::SUCCESS;
      case ST_ERROR:
        m_end_decode = true;
        msg = "decode error, end decode";
        return Info::FAIL;
      case ST_EOS:
        m_end_decode = true;
        msg = "end of stream";
        return Info::END_OF_STREAM;
      case ST_RES_CHANGE:
        return Info::RES_CHANGE;
      case ST_MORE:
        continue;
    }
  }
}

int64_t VideoDecoder::TsFromTime(double ts_sec) const {
  auto ts_tbu = llround(ts_sec * AV_TIME_BASE);
  AVRational factor = {1, AV_TIME_BASE};
  return av_rescale_q(ts_tbu, factor, VideoStream()->time_base);
}

int64_t VideoDecoder::TsFromFrameNumber(int64_t frame_num) const {
  return TsFromTime(static_cast<double>(frame_num) / FrameRate());
}

Info VideoDecoder::Seek(int64_t frame_num, double ts_sec, bool by_number,
                        std::string& msg) {
  if (!m_codec_open || !m_frame) {
    msg = "decoder not open (probe-only instance?)";
    return Info::FAIL;
  }
  if ((m_fmt_ctx->flags & AVFMT_FLAG_CUSTOM_IO) && !m_custom_io_seekable) {
    msg = "Seek operation is not supported by AVIOContext.";
    return Info::NOT_SUPPORTED;
  }
  if (IsVFR() && by_number) {
    msg = "Seek by frame number isn't supported for VFR sequences. "
          "Seek by timestamp instead";
    return Info::NOT_SUPPORTED;
  }

  int64_t timestamp =
      by_number ? TsFromFrameNumber(frame_num) : TsFromTime(ts_sec);
  // Lower seek bound: one GOP (or one second) before the target, so a
  // demuxer on sparse-keyframe content cannot land arbitrarily early and
  // pay an unbounded decode-forward (parity: TaskDecodeFrame.cpp:975-981).
  // Caveat shared with the reference: avctx->gop_size on a DECODE context
  // is the libavcodec default (12), not the stream's real GOP — demuxers
  // that honor min_ts could be handed a window excluding the governing
  // key frame on long-GOP content, so a failed windowed seek retries
  // unbounded below (the reference has no such fallback).
  int64_t gop = m_avc_ctx ? m_avc_ctx->gop_size : 0;
  int64_t min_timestamp =
      by_number
          ? (gop > 0 ? TsFromFrameNumber(std::max<int64_t>(frame_num - gop,
                                                           0))
                     : 0)
          : TsFromTime(std::max(ts_sec - 1.0, 0.0));
  int64_t start_time = VideoStream()->start_time;
  if (AV_NOPTS_VALUE != start_time) {
    timestamp += start_time;
    min_timestamp += start_time;
  } else {
    start_time = 0;
  }

  // Full codec reopen, then backwards container seek (parity:
  // TaskDecodeFrame.cpp:990-1002).
  CloseCodec();
  try {
    OpenCodec();
  } catch (const std::exception& e) {
    // OpenCodec throws (ctor path); from here it must degrade to the
    // (FAIL, msg) contract — an exception would unwind through the
    // GIL-released binding frame and terminate the interpreter
    msg = std::string("codec reopen during seek failed: ") + e.what();
    return Info::FAIL;
  }

  m_timeout->Reset();
  int ret = avformat_seek_file(m_fmt_ctx, m_stream_idx, min_timestamp,
                               timestamp, timestamp, AVSEEK_FLAG_BACKWARD);
  if (ret < 0 && min_timestamp > 0) {
    // window may have excluded the governing key frame: retry unbounded
    ret = avformat_seek_file(m_fmt_ctx, m_stream_idx, 0, timestamp,
                             timestamp, AVSEEK_FLAG_BACKWARD);
  }
  if (ret < 0) {
    msg = av_err_str(ret);
    return Info::FAIL;
  }
  avcodec_flush_buffers(m_avc_ctx);

  m_frame->pts = AV_NOPTS_VALUE;
  m_eof = false;
  m_end_decode = false;
  m_noacpt = false;
  m_res_change = false;
  while (!m_pkt_queue.empty()) {
    AVPacket* p = m_pkt_queue.front();
    m_pkt_queue.pop();
    av_packet_free(&p);
  }

  // Decode forward until we land on the requested timestamp.
  while (m_frame->pts + start_time < timestamp) {
    Info info = DecodeNext(msg);
    if (info != Info::SUCCESS && info != Info::RES_CHANGE) return info;
    if (info == Info::RES_CHANGE) return info;
    // KEY_FRAMES mode: seek lands on a key frame; one iteration only.
    if (m_mode == 1) return info;
  }
  return Info::SUCCESS;
}

int VideoDecoder::CopyFrame(uint8_t* dst, size_t capacity) {
  if (!m_frame || m_frame->width <= 0) return -1;
  const auto ffmt = static_cast<AVPixelFormat>(m_frame->format);
  if (ffmt == AV_PIX_FMT_YUV420P12 &&
      (m_frame->width % 2 != 0 || m_frame->height % 2 != 0)) {
    // Odd geometry cannot be expressed in the semi-planar P012 layout
    // (interleaved UV rows need 2*ceil(w/2) samples > w). Mislabeling
    // planar LSB-aligned bytes as PixFmt::P12 would hand consumers wrong
    // data with no way to detect it, so fail loudly — before the
    // full-frame copy, which would only be thrown away
    // (kErrUnrepresentableLayout, surfaced as UNSUPPORTED_FMT_CONV).
    return kErrUnrepresentableLayout;
  }
  int n = av_image_copy_to_buffer(dst, static_cast<int>(capacity),
                                  m_frame->data, m_frame->linesize, ffmt,
                                  m_frame->width, m_frame->height, 1);
  if (n < 0) return n;
  if (ffmt == AV_PIX_FMT_YUV420P12) {
    // PixFmt::P12 means the NVDEC P012 layout everywhere above this
    // layer (semi-planar, MSB-aligned 16-bit — see formats.py and the
    // reference's GPU path). Software decoders hand us planar
    // LSB-aligned yuv420p12; repack in place so both the host buffer
    // and the device path see genuine P012.
    const size_t w = m_frame->width, h = m_frame->height;
    auto* p = reinterpret_cast<uint16_t*>(dst);
    // FFmpeg packs yuv420p chroma planes at ceil(w/2) x ceil(h/2)
    const size_t luma = w * h, cw = (w + 1) / 2, ch = (h + 1) / 2;
    for (size_t i = 0; i < luma; i++) p[i] = static_cast<uint16_t>(p[i] << 4);
    std::vector<uint16_t> uv(w * ch);
    const uint16_t* u = p + luma;
    const uint16_t* v = u + cw * ch;
    for (size_t r = 0; r < ch; r++) {
      for (size_t c = 0; c < cw; c++) {
        uv[r * w + 2 * c] = static_cast<uint16_t>(u[r * cw + c] << 4);
        uv[r * w + 2 * c + 1] = static_cast<uint16_t>(v[r * cw + c] << 4);
      }
    }
    std::memcpy(p + luma, uv.data(), uv.size() * sizeof(uint16_t));
  }
  return n;
}

void VideoDecoder::SaveSideData() {
  m_motion_vectors.clear();
  AVFrameSideData* sd =
      av_frame_get_side_data(m_frame, AV_FRAME_DATA_MOTION_VECTORS);
  if (sd) {
    auto* mv = reinterpret_cast<const AVMotionVector*>(sd->data);
    size_t n = sd->size / sizeof(AVMotionVector);
    m_motion_vectors.assign(mv, mv + n);
  }

  sd = av_frame_get_side_data(m_frame, AV_FRAME_DATA_DISPLAYMATRIX);
  if (sd) {
    m_rotation =
        av_display_rotation_get(reinterpret_cast<const int32_t*>(sd->data));
    m_has_rotation = true;
  }
  // Display matrix may also live on the stream instead of the frame.
  if (!m_has_rotation) {
    for (int i = 0; i < VideoStream()->nb_side_data; i++) {
      const AVPacketSideData& psd = VideoStream()->side_data[i];
      if (psd.type == AV_PKT_DATA_DISPLAYMATRIX) {
        m_rotation = av_display_rotation_get(
            reinterpret_cast<const int32_t*>(psd.data));
        m_has_rotation = true;
        break;
      }
    }
  }
}

void VideoDecoder::SavePacketData() {
  m_packet_data = {};
  m_packet_data.pts = m_frame->pts;
#if LIBAVUTIL_VERSION_MAJOR >= 58
  m_packet_data.key = (m_frame->flags & AV_FRAME_FLAG_KEY) != 0;
#else
  m_packet_data.key = m_frame->key_frame != 0;
#endif
  m_packet_data.dts = m_frame->pkt_dts;
#if LIBAVUTIL_VERSION_MAJOR >= 58
  m_packet_data.duration = m_frame->duration;
#else
  m_packet_data.duration = m_frame->pkt_duration;
#endif
  m_packet_data.pos = m_frame->pkt_pos;
}

int VideoDecoder::HostFrameSize() const {
  AVPixelFormat fmt = to_av_pix_fmt(Format());
  int size = av_image_get_buffer_size(fmt, Width(), Height(), 1);
  return size < 0 ? 0 : size;
}

PixFmt VideoDecoder::Format() const {
  // Prefer the decoded frame's own format (some decoders, e.g. mjpeg,
  // leave the context pix_fmt unset until mid-decode).
  if (m_frame && m_frame->width > 0 && m_frame->format != AV_PIX_FMT_NONE) {
    return from_av_pix_fmt(static_cast<AVPixelFormat>(m_frame->format));
  }
  if (m_avc_ctx && m_avc_ctx->pix_fmt != AV_PIX_FMT_NONE) {
    return from_av_pix_fmt(m_avc_ctx->pix_fmt);
  }
  return from_av_pix_fmt(
      static_cast<AVPixelFormat>(VideoStream()->codecpar->format));
}

int VideoDecoder::Level() const { return VideoStream()->codecpar->level; }
int VideoDecoder::Profile() const { return VideoStream()->codecpar->profile; }
int VideoDecoder::Delay() const { return m_avc_ctx ? m_avc_ctx->delay : 0; }
int VideoDecoder::GopSize() const {
  return m_avc_ctx ? m_avc_ctx->gop_size : 0;
}
int64_t VideoDecoder::Bitrate() const {
  return VideoStream()->codecpar->bit_rate;
}
int64_t VideoDecoder::NumFrames() const { return VideoStream()->nb_frames; }
int VideoDecoder::NumStreams() const { return m_fmt_ctx->nb_streams; }
double VideoDecoder::FrameRate() const {
  return rational_to_double(VideoStream()->r_frame_rate);
}
double VideoDecoder::AvgFrameRate() const {
  return rational_to_double(VideoStream()->avg_frame_rate);
}
double VideoDecoder::TimeBase() const {
  return rational_to_double(VideoStream()->time_base);
}
double VideoDecoder::StartTime() const {
  // Parity: reference divides stream start_time by AV_TIME_BASE
  // (TaskDecodeFrame.cpp GetStreamParams).
  if (AV_NOPTS_VALUE == VideoStream()->start_time) return 0.0;
  return static_cast<double>(VideoStream()->start_time) / AV_TIME_BASE;
}
double VideoDecoder::Duration() const {
  // Deviation from the reference (which divides stream-tb units by
  // AV_TIME_BASE): report true seconds.
  AVStream* s = VideoStream();
  if (s->duration != AV_NOPTS_VALUE) {
    return s->duration * rational_to_double(s->time_base);
  }
  if (m_fmt_ctx->duration != AV_NOPTS_VALUE) {
    return static_cast<double>(m_fmt_ctx->duration) / AV_TIME_BASE;
  }
  return 0.0;
}
int VideoDecoder::ColorSpaceId() const {
  return from_av_color_space(VideoStream()->codecpar->color_space);
}
int VideoDecoder::ColorRangeId() const {
  return from_av_color_range(VideoStream()->codecpar->color_range);
}
bool VideoDecoder::IsVFR() const { return FrameRate() != AvgFrameRate(); }

std::map<std::string, std::map<std::string, std::string>>
VideoDecoder::Metadata() const {
  std::map<std::string, std::map<std::string, std::string>> md;
  std::map<std::string, AVDictionary*> sources = {
      {"context", m_fmt_ctx->metadata},
      {"video_stream", VideoStream()->metadata}};
  for (auto& src : sources) {
    const AVDictionaryEntry* tag = nullptr;
    while ((tag = av_dict_get(src.second, "", tag, AV_DICT_IGNORE_SUFFIX))) {
      md[src.first][tag->key] = tag->value;
    }
  }
  return md;
}

bool VideoDecoder::GetStreamParams(int idx, StreamParamsC& out) const {
  if (idx < 0 || idx >= NumStreams()) return false;
  AVStream* stream = m_fmt_ctx->streams[idx];
  if (!stream || !stream->codecpar) return false;
  if (stream->codecpar->codec_type != AVMEDIA_TYPE_VIDEO) return false;

  out.width = stream->codecpar->width;
  out.height = stream->codecpar->height;
  out.fourcc = stream->codecpar->codec_tag;
  out.codec_id = stream->codecpar->codec_id;
  out.color_space = from_av_color_space(stream->codecpar->color_space);
  out.color_range = from_av_color_range(stream->codecpar->color_range);
  out.num_frames = stream->nb_frames;
  out.start_time =
      stream->start_time == AV_NOPTS_VALUE ? 0 : stream->start_time;
  out.bit_rate = stream->codecpar->bit_rate;
  out.profile = stream->codecpar->profile;
  out.level = stream->codecpar->level;
  out.fps = rational_to_double(stream->r_frame_rate);
  out.avg_fps = rational_to_double(stream->avg_frame_rate);
  out.time_base = rational_to_double(stream->time_base);
  out.start_time_sec = static_cast<double>(out.start_time) / AV_TIME_BASE;
  out.duration_sec =
      stream->duration == AV_NOPTS_VALUE
          ? 0.0
          : stream->duration * rational_to_double(stream->time_base);
  return true;
}

}  // namespace vali
