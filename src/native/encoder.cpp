#include "encoder.hpp"

#include <algorithm>
#include <cstring>
#include <iostream>
#include <sstream>

namespace vali {

namespace {

// Parse NVENC-style bitrate strings: "10M", "500K", "3000000"
// (parity: the reference's ParseBitrate in NvCodecCliOptions.cpp).
int64_t parse_bitrate(const std::string& s) {
  if (s.empty()) return 0;
  char suffix = s.back();
  int64_t mult = 1;
  std::string num = s;
  if (suffix == 'k' || suffix == 'K') {
    mult = 1000;
    num = s.substr(0, s.size() - 1);
  } else if (suffix == 'm' || suffix == 'M') {
    mult = 1000 * 1000;
    num = s.substr(0, s.size() - 1);
  }
  return static_cast<int64_t>(std::stoll(num)) * mult;
}

// NVENC preset P1 (fastest) .. P7 (best quality) -> x264/x265 preset names.
const char* map_preset(std::string p) {
  std::transform(p.begin(), p.end(), p.begin(), ::tolower);
  if (p == "p1") return "ultrafast";
  if (p == "p2") return "superfast";
  if (p == "p3") return "veryfast";
  if (p == "p4") return "medium";
  if (p == "p5") return "slow";
  if (p == "p6") return "slower";
  if (p == "p7") return "veryslow";
  // also accept x264-style names directly
  return nullptr;
}

const OptMap kOptionDocs = {
    {"codec", "video codec: {'codec' : 'h264'}"},
    {"preset", "encoder preset: {'preset' : 'P4'}"},
    {"tuning_info", "how to tune the encoder: {'tuning_info' : 'high_quality'}"},
    {"profile", "h.264 profile: {'profile' : 'high'}"},
    {"max_res", "max resolution: {'max_res' : '3840x2160'}"},
    {"s", "video frame size: {'s' : '1920x1080'}"},
    {"fps", "video fps: {'fps' : '30'}"},
    {"bf", "number of b frames: {'bf' : '3'}"},
    {"gop", "gop size: {'gop' : '30'}"},
    {"bitrate", "bitrate: {'bitrate' : '10M'}"},
    {"multipass", "multi-pass encoding: {'multipass' : 'fullres'}"},
    {"ldkfs", "low-delay key frame: {'ldkfs' : ''}"},
    {"maxbitrate", "max bitrate: {'maxbitrate' : '20M'}"},
    {"vbvbufsize", "vbv buffer size: {'vbvbufsize' : '10M'}"},
    {"vbvinit", "init vbv buffer size: {'vbvinit' : '10M'}"},
    {"cq", "cq parameter: {'cq' : ''}"},
    {"rc", "rc mode: {'rc' : 'cbr'}"},
    {"initqp", "initial qp parameter value: {'initqp' : '32'}"},
    {"qmin", "minimum qp: {'qmin' : '28'}"},
    {"qmax", "maximum qp: {'qmax' : '36'}"},
    {"constqp", "const qp mode: {'constqp' : ''}"},
    {"temporalaq", "temporal adaptive quantization: {'temporalaq' : ''}"},
    {"lookahead", "look ahead encoding: {'lookahead' : '8'}"},
    {"aq", "adaptive quantization: {'aq' : ''}"},
    {"fmt", "pixel format: {'fmt' : 'YUV444'}"},
    {"idrperiod", "distance between I frames: {'idrperiod' : '256'}"},
    {"numrefl0", "number of ref frames in l0 list: {'numrefl0' : '4'}"},
    {"numrefl1", "number of ref frames in l1 list: {'numrefl1' : '4'}"},
    {"repeatspspps",
     "enable writing of Sequence and Picture parameter for every IDR frame: "
     "{'repeatspspps' : '0'}"},
};

}  // namespace

const OptMap& encoder_option_docs() { return kOptionDocs; }

VideoEncoder::VideoEncoder(OptMap opts, PixFmt fmt, bool verbose)
    : m_opts(std::move(opts)), m_fmt(fmt), m_verbose(verbose) {
  // Validate option names like the reference's NvEncoderClInterface does.
  for (const auto& kv : m_opts) {
    if (kOptionDocs.find(kv.first) == kOptionDocs.end()) {
      throw std::runtime_error("Invalid parameter name \"" + kv.first +
                               "\" for encoder");
    }
  }
  auto it = m_opts.find("s");
  if (it == m_opts.end()) {
    throw std::runtime_error("Mandatory parameter 's' (frame size) missing");
  }
  if (sscanf(it->second.c_str(), "%dx%d", &m_width, &m_height) != 2 ||
      m_width <= 0 || m_height <= 0) {
    throw std::runtime_error("Invalid frame size: " + it->second);
  }
  try {
    Open();
  } catch (...) {
    Close();  // ctor throw: destructor won't run
    throw;
  }
}

VideoEncoder::~VideoEncoder() { Close(); }

void VideoEncoder::Close() {
  if (m_ctx) avcodec_free_context(&m_ctx);
  if (m_frame) av_frame_free(&m_frame);
  if (m_pkt) av_packet_free(&m_pkt);
  m_flushed = false;
}

void VideoEncoder::Open() {
  std::string codec_name = "h264";
  auto it = m_opts.find("codec");
  if (it != m_opts.end()) codec_name = it->second;
  std::transform(codec_name.begin(), codec_name.end(), codec_name.begin(),
                 ::tolower);
  m_is_hevc = (codec_name == "hevc" || codec_name == "h265");
  // Reference parity is h264 + hevc (NvCodecCliOptions.cpp:136-137);
  // any other name resolves through libavcodec as a beyond-reference
  // software encoder (vp9, av1, mpeg2video, ...) with only the generic
  // option subset applied.
  m_generic = !m_is_hevc && codec_name != "h264" && codec_name != "avc";

  std::string enc_name = m_is_hevc ? "libx265"
                         : (m_generic ? codec_name : "libx264");
  const AVCodec* codec = avcodec_find_encoder_by_name(enc_name.c_str());
  if (!codec && m_generic) {
    const AVCodecDescriptor* d =
        avcodec_descriptor_get_by_name(codec_name.c_str());
    if (d) codec = avcodec_find_encoder(d->id);
    if (codec) enc_name = codec->name;
  }
  if (!codec) {
    throw std::runtime_error(std::string("Encoder not available: ") +
                             enc_name);
  }

  m_ctx = avcodec_alloc_context3(codec);
  if (!m_ctx) throw std::runtime_error("Failed to allocate encoder context");

  m_ctx->width = m_width;
  m_ctx->height = m_height;

  // Input pixel format: what the codec ingests. NV12 goes straight into
  // x264; x265 gets a deinterleaved YUV420 copy (FillFrame).
  switch (m_fmt) {
    case PixFmt::NV12:
      m_enc_pix_fmt = (m_is_hevc || m_generic) ? AV_PIX_FMT_YUV420P
                                               : AV_PIX_FMT_NV12;
      break;
    case PixFmt::YUV420:
      m_enc_pix_fmt = AV_PIX_FMT_YUV420P;
      break;
    case PixFmt::YUV444:
      m_enc_pix_fmt = AV_PIX_FMT_YUV444P;
      break;
    case PixFmt::YUV420_10bit:
      m_enc_pix_fmt = AV_PIX_FMT_YUV420P10;
      break;
    case PixFmt::YUV444_10bit:
      m_enc_pix_fmt = AV_PIX_FMT_YUV444P10;
      break;
    default:
      throw std::runtime_error("Unsupported encoder input format");
  }
  // Check the codec supports it. A NULL pix_fmts list means the codec
  // accepts any format (FFmpeg convention, e.g. rawvideo/wrapped
  // encoders), not that it supports none.
  bool supported = codec->pix_fmts == nullptr;
  for (const AVPixelFormat* p = codec->pix_fmts;
       p && *p != AV_PIX_FMT_NONE; p++) {
    if (*p == m_enc_pix_fmt) {
      supported = true;
      break;
    }
  }
  if (!supported) {
    throw std::runtime_error(
        std::string("Encoder ") + enc_name +
        " does not support input format " +
        av_get_pix_fmt_name(m_enc_pix_fmt));
  }
  m_ctx->pix_fmt = m_enc_pix_fmt;

  // Auto codec threading (avctx default is 1 = single-threaded x264).
  m_ctx->thread_count = 0;

  int fps = 30;
  it = m_opts.find("fps");
  if (it != m_opts.end()) fps = std::stoi(it->second);
  m_ctx->time_base = {1, fps};
  m_ctx->framerate = {fps, 1};

  it = m_opts.find("gop");
  if (it != m_opts.end()) m_ctx->gop_size = std::stoi(it->second);
  it = m_opts.find("idrperiod");
  if (it != m_opts.end() && m_opts.find("gop") == m_opts.end()) {
    m_ctx->gop_size = std::stoi(it->second);
  }
  it = m_opts.find("bf");
  if (it != m_opts.end()) m_ctx->max_b_frames = std::stoi(it->second);
  it = m_opts.find("bitrate");
  if (it != m_opts.end()) m_ctx->bit_rate = parse_bitrate(it->second);
  it = m_opts.find("maxbitrate");
  if (it != m_opts.end()) m_ctx->rc_max_rate = parse_bitrate(it->second);
  it = m_opts.find("vbvbufsize");
  if (it != m_opts.end()) m_ctx->rc_buffer_size = parse_bitrate(it->second);
  it = m_opts.find("vbvinit");
  if (it != m_opts.end()) {
    m_ctx->rc_initial_buffer_occupancy = parse_bitrate(it->second);
  }
  it = m_opts.find("qmin");
  if (it != m_opts.end()) m_ctx->qmin = std::stoi(it->second);
  it = m_opts.find("qmax");
  if (it != m_opts.end()) m_ctx->qmax = std::stoi(it->second);
  it = m_opts.find("numrefl0");
  if (it != m_opts.end()) m_ctx->refs = std::stoi(it->second);

  AVDictionary* priv = nullptr;
  std::string x265_params;  // accumulated, ':'-joined, set once below
  auto add_x265_param = [&x265_params](const std::string& p) {
    if (!x265_params.empty()) x265_params += ":";
    x265_params += p;
  };
  if (m_generic) {
    // speed knobs so software VP9/AV1 stay usable for fixtures/tests
    if (enc_name.rfind("libvpx", 0) == 0) {
      av_dict_set(&priv, "deadline", "realtime", 0);
      av_dict_set(&priv, "cpu-used", "8", 0);
    } else if (enc_name == "libaom-av1") {
      av_dict_set(&priv, "usage", "realtime", 0);
      av_dict_set(&priv, "cpu-used", "8", 0);
    }
    OpenWithPriv(codec, priv);
    return;
  }
  std::string tuning;
  it = m_opts.find("tuning_info");
  if (it != m_opts.end()) tuning = it->second;

  it = m_opts.find("preset");
  if (it != m_opts.end()) {
    const char* preset = map_preset(it->second);
    av_dict_set(&priv, "preset", preset ? preset : it->second.c_str(), 0);
  } else {
    // NVENC tuning_info=high_quality trades speed for quality; with no
    // explicit preset the software equivalent is a slower x264/x265
    // preset (parity: NvCodecCliOptions.cpp tuning_info handling).
    av_dict_set(&priv, "preset",
                tuning == "high_quality" ? "slow" : "medium", 0);
  }
  if (tuning == "low_latency" || tuning == "ultra_low_latency") {
    av_dict_set(&priv, "tune", "zerolatency", 0);
  } else if (tuning == "lossless") {
    if (m_is_hevc) {
      add_x265_param("lossless=1");
    } else {
      av_dict_set(&priv, "qp", "0", 0);
    }
  }
  // Repeat SPS/PPS on every IDR. libx264 already does this for annex-B
  // elementary streams when global headers are off (our case); x265
  // needs it requested explicitly.
  it = m_opts.find("repeatspspps");
  if (it != m_opts.end() && it->second != "0" && m_is_hevc) {
    add_x265_param("repeat-headers=1");
  }
  it = m_opts.find("profile");
  if (it != m_opts.end()) av_dict_set(&priv, "profile", it->second.c_str(), 0);

  it = m_opts.find("rc");
  std::string rc = it != m_opts.end() ? it->second : "";
  if (rc == "cbr" && m_ctx->bit_rate > 0) {
    m_ctx->rc_max_rate = m_ctx->bit_rate;
    m_ctx->rc_min_rate = m_ctx->bit_rate;
    if (!m_ctx->rc_buffer_size) {
      m_ctx->rc_buffer_size = static_cast<int>(m_ctx->bit_rate);
    }
    if (!m_is_hevc) av_dict_set(&priv, "x264-params", "nal-hrd=cbr", 0);
  }
  it = m_opts.find("constqp");
  if (it != m_opts.end()) {
    std::string qp = it->second.empty() ? "23" : it->second;
    av_dict_set(&priv, "qp", qp.c_str(), 0);
  }
  it = m_opts.find("initqp");
  if (it != m_opts.end() && m_opts.find("constqp") == m_opts.end()) {
    // NVENC initqp only SEEDS the rate-control loop; mapping it to the
    // x264/x265 'qp' option would switch the whole encode to constant-QP
    // and silently discard the requested bitrate. Honor it as a QP only
    // in constqp rate-control mode; otherwise it has no software
    // equivalent.
    if (rc == "constqp") {
      av_dict_set(&priv, "qp", it->second.c_str(), 0);
    } else if (m_verbose) {
      std::cerr << "vali-tpu encoder: 'initqp' seeds NVENC rate control; "
                   "no software equivalent outside rc=constqp, ignored\n";
    }
  }
  it = m_opts.find("cq");
  if (it != m_opts.end() && !it->second.empty()) {
    av_dict_set(&priv, "crf", it->second.c_str(), 0);
  }
  // libx265 exposes no 'rc-lookahead'/'aq-mode' AVOptions (unconsumed
  // dict entries are silently freed after open) — its knobs must go
  // through x265-params.
  it = m_opts.find("lookahead");
  if (it != m_opts.end()) {
    if (m_is_hevc) add_x265_param("rc-lookahead=" + it->second);
    else av_dict_set(&priv, "rc-lookahead", it->second.c_str(), 0);
  }
  // NVENC spatial AQ -> x264/x265 variance AQ; temporal AQ -> mb-tree.
  it = m_opts.find("aq");
  if (it != m_opts.end()) {
    if (m_is_hevc) add_x265_param("aq-mode=1");
    else av_dict_set(&priv, "aq-mode", "1", 0);
  }
  it = m_opts.find("temporalaq");
  if (it != m_opts.end() && !m_is_hevc) {
    av_dict_set(&priv, "mbtree", "1", 0);
  }
  // NVENC multipass has no single-shot software equivalent (x264/x265
  // two-pass needs a stats file + two encodes); approximate the quality
  // benefit by extending the rate-control lookahead window.
  it = m_opts.find("multipass");
  if (it != m_opts.end() && it->second != "0" &&
      m_opts.find("lookahead") == m_opts.end()) {
    if (m_is_hevc) add_x265_param("rc-lookahead=32");
    else av_dict_set(&priv, "rc-lookahead", "32", 0);
  }
  // force_idr contract (NVENC forceIDR): a forced pict_type=I must come
  // out as a true IDR. Both wrappers gate that behind 'forced-idr';
  // x265 additionally demotes a forced IDR to a CRA under its default
  // open GOP, so HEVC closes the GOP — which is itself NVENC parity
  // (NVENC HEVC has no open-GOP mode; its keyframes are IDR). Measured
  // here: forced-idr alone -> CRA; no-open-gop alone -> non-IRAP I
  // slice; both -> IDR_N_LP with repeated parameter sets.
  av_dict_set(&priv, "forced-idr", "1", 0);
  if (m_is_hevc) add_x265_param("no-open-gop=1");
  if (m_verbose) {
    for (const char* ignored : {"ldkfs", "max_res", "numrefl1"}) {
      if (m_opts.count(ignored)) {
        std::cerr << "vali-tpu encoder: option '" << ignored
                  << "' has no software equivalent, ignored\n";
      }
    }
  }
  // SEI passthrough: enable user-data-unregistered side data emission.
  av_dict_set(&priv, "udu_sei", "1", 0);
  // Quiet x265's banner unless verbose.
  if (m_is_hevc && !m_verbose) {
    add_x265_param("log-level=error");
  }
  if (m_is_hevc && !x265_params.empty()) {
    av_dict_set(&priv, "x265-params", x265_params.c_str(), 0);
  }

  OpenWithPriv(codec, priv);
}

void VideoEncoder::OpenWithPriv(const AVCodec* codec, AVDictionary* priv) {
  int res = avcodec_open2(m_ctx, codec, &priv);
  if (priv) av_dict_free(&priv);
  throw_on_av_error(res, "Failed to open encoder");

  m_frame = av_frame_alloc();
  m_pkt = av_packet_alloc();
  if (!m_frame || !m_pkt) throw std::runtime_error("Encoder alloc failure");
  m_frame->format = m_enc_pix_fmt;
  m_frame->width = m_width;
  m_frame->height = m_height;
  res = av_frame_get_buffer(m_frame, 0);
  throw_on_av_error(res, "Failed to allocate frame buffer");
}

size_t VideoEncoder::FrameSize() const {
  AVPixelFormat host_fmt = to_av_pix_fmt(m_fmt);
  int size = av_image_get_buffer_size(host_fmt, m_width, m_height, 1);
  return size > 0 ? static_cast<size_t>(size) : 0;
}

void VideoEncoder::FillFrame(AVFrame* frame, const uint8_t* data) {
  const int w = m_width, h = m_height;
  if (m_fmt == PixFmt::NV12 && m_enc_pix_fmt == AV_PIX_FMT_YUV420P) {
    // Deinterleave NV12 -> I420 for x265.
    const uint8_t* src_y = data;
    const uint8_t* src_uv = data + static_cast<size_t>(w) * h;
    for (int r = 0; r < h; r++) {
      memcpy(frame->data[0] + r * frame->linesize[0], src_y + r * w, w);
    }
    for (int r = 0; r < h / 2; r++) {
      const uint8_t* uv = src_uv + r * w;
      uint8_t* u = frame->data[1] + r * frame->linesize[1];
      uint8_t* v = frame->data[2] + r * frame->linesize[2];
      for (int c = 0; c < w / 2; c++) {
        u[c] = uv[2 * c];
        v[c] = uv[2 * c + 1];
      }
    }
    return;
  }
  // Host layout is the dense align-1 image of m_enc_pix_fmt.
  uint8_t* src_data[4] = {nullptr};
  int src_linesize[4] = {0};
  av_image_fill_arrays(src_data, src_linesize, data, m_enc_pix_fmt, w, h, 1);
  av_image_copy(frame->data, frame->linesize,
                const_cast<const uint8_t**>(src_data), src_linesize,
                m_enc_pix_fmt, w, h);
}

Info VideoEncoder::DrainPackets(std::string& msg) {
  while (true) {
    int res = avcodec_receive_packet(m_ctx, m_pkt);
    if (res == AVERROR(EAGAIN) || res == AVERROR_EOF) return Info::SUCCESS;
    if (res < 0) {
      msg = av_err_str(res);
      return Info::FAIL;
    }
    m_queue.emplace_back(m_pkt->data, m_pkt->data + m_pkt->size);
    av_packet_unref(m_pkt);
  }
}

Info VideoEncoder::EncodeFrame(const uint8_t* data, size_t size,
                               bool force_idr, const uint8_t* sei,
                               size_t sei_size, std::string& msg) {
  if (!m_ctx) {
    msg = "encoder not open (failed Reconfigure?)";
    return Info::FAIL;
  }
  if (!data) return Flush(msg);
  if (size < FrameSize()) {
    msg = "Input frame too small";
    return Info::INVALID_INPUT;
  }
  int res = av_frame_make_writable(m_frame);
  if (res < 0) {
    msg = av_err_str(res);
    return Info::FAIL;
  }
  FillFrame(m_frame, data);
  m_frame->pts = m_frame_index++;
  m_frame->pict_type = force_idr ? AV_PICTURE_TYPE_I : AV_PICTURE_TYPE_NONE;

  av_frame_remove_side_data(m_frame, AV_FRAME_DATA_SEI_UNREGISTERED);
  if (sei && sei_size) {
    AVFrameSideData* sd = av_frame_new_side_data(
        m_frame, AV_FRAME_DATA_SEI_UNREGISTERED, sei_size);
    if (sd) memcpy(sd->data, sei, sei_size);
  }

  res = avcodec_send_frame(m_ctx, m_frame);
  if (res < 0) {
    msg = av_err_str(res);
    return Info::FAIL;
  }
  return DrainPackets(msg);
}

Info VideoEncoder::Flush(std::string& msg) {
  if (!m_ctx) {
    msg = "encoder not open (failed Reconfigure?)";
    return Info::FAIL;
  }
  if (!m_flushed) {
    int res = avcodec_send_frame(m_ctx, nullptr);
    if (res < 0 && res != AVERROR_EOF) {
      msg = av_err_str(res);
      return Info::FAIL;
    }
    m_flushed = true;
  }
  return DrainPackets(msg);
}

bool VideoEncoder::PopPacket(std::vector<uint8_t>& out) {
  if (m_queue.empty()) return false;
  out = std::move(m_queue.front());
  m_queue.pop_front();
  return true;
}

Info VideoEncoder::Reconfigure(const OptMap& new_opts, bool force_idr,
                               bool reset_enc, std::string& msg) {
  // Validate EVERYTHING before merging: a rejected call must leave
  // m_opts untouched, or the bad values poison the next Reconfigure.
  for (const auto& kv : new_opts) {
    if (kOptionDocs.find(kv.first) == kOptionDocs.end()) {
      msg = "Invalid parameter name \"" + kv.first + "\"";
      return Info::INVALID_INPUT;
    }
  }
  auto it = new_opts.find("s");
  int w = m_width, h = m_height;
  if (it != new_opts.end()) {
    // validate like the constructor: a partial match ("1920") would
    // silently keep the old height and reopen at a size the caller
    // never asked for
    if (sscanf(it->second.c_str(), "%dx%d", &w, &h) != 2 || w <= 0 ||
        h <= 0) {
      msg = "Invalid frame size: " + it->second;
      return Info::INVALID_INPUT;
    }
  }
  if (!reset_enc && (w != m_width || h != m_height)) {
    msg = "Resolution change requires reset_encoder=True";
    return Info::NOT_SUPPORTED;
  }
  for (const auto& kv : new_opts) m_opts[kv.first] = kv.second;
  m_width = w;
  m_height = h;
  // Software encoders can't be re-tuned in flight: drain, close, reopen.
  Flush(msg);
  Close();
  m_frame_index = 0;
  try {
    Open();
  } catch (...) {
    // roll back to a fully-closed state: a half-open context (m_ctx set,
    // m_frame null after a failed avcodec_open2) would crash the next
    // EncodeFrame; closed, it reports "encoder not open" instead.
    Close();
    throw;
  }
  return Info::SUCCESS;
}

}  // namespace vali
