/* FFmpeg demux + decode engine.
 *
 * Behavioral parity target: the reference decoder state machine
 * (TaskDecodeFrame.cpp:106-1129): packet-queue read/send/receive with EAGAIN
 * backpressure, EOS drain, KEY_FRAMES packet filtering, seek with codec
 * reopen, resolution-change stash protocol, side data (motion vectors,
 * display rotation), probe, metadata. Decode is always host-side for the TPU
 * build (no codec ASIC on TPU); frames land in a dense host layout that the
 * Python layer uploads to HBM.
 */
#pragma once

#include <functional>
#include <memory>
#include <queue>

#include "common.hpp"

namespace vali {

// Custom-IO hooks (the BufferedReader path). Callbacks run on the decode
// thread; the Python binding acquires the GIL inside them.
struct IoHooks {
  void* opaque = nullptr;
  int (*read)(void* opaque, uint8_t* buf, int buf_size) = nullptr;
  int64_t (*seek)(void* opaque, int64_t offset, int whence) = nullptr;
  int buffer_size = 4 * 1024 * 1024;
  bool seekable = false;
};

class VideoDecoder {
 public:
  // mode: 0 = ALL_FRAMES, 1 = KEY_FRAMES (vali_tpu.core.enums.DecodeMode)
  VideoDecoder(const char* url, OptMap opts, const IoHooks* io, bool probe);
  ~VideoDecoder();

  VideoDecoder(const VideoDecoder&) = delete;
  VideoDecoder& operator=(const VideoDecoder&) = delete;

  /// Decode the next frame into the internal AVFrame.
  /// Returns an Info code; SUCCESS / RES_CHANGE leave a frame pending.
  Info DecodeNext(std::string& msg);

  /// Seek then decode forward to the requested position.
  Info Seek(int64_t frame_num, double ts_sec, bool by_number,
            std::string& msg);

  /// Copy the pending decoded frame into dst (host layout, alignment 1).
  /// Returns bytes written, or <0 on failure
  /// (kErrUnrepresentableLayout: frame layout cannot be expressed in the
  /// advertised PixFmt, e.g. odd-dimension yuv420p12 vs semi-planar P012).
  static constexpr int kErrUnrepresentableLayout = -1000;
  int CopyFrame(uint8_t* dst, size_t capacity);

  // --- stream / codec properties ---------------------------------------
  int Width() const;
  int Height() const;
  int Level() const;
  int Profile() const;
  int Delay() const;
  int GopSize() const;
  int64_t Bitrate() const;
  int64_t NumFrames() const;
  int NumStreams() const;
  int StreamIndex() const { return m_stream_idx; }
  int HostFrameSize() const;
  double FrameRate() const;
  double AvgFrameRate() const;
  double TimeBase() const;
  double StartTime() const;
  double Duration() const;
  int ColorSpaceId() const;
  int ColorRangeId() const;
  PixFmt Format() const;
  bool IsVFR() const;
  int Mode() const { return m_mode; }
  void SetMode(int mode) { m_mode = mode; }

  const PacketDataC& LastPacketData() const { return m_packet_data; }
  bool HasDisplayRotation() const { return m_has_rotation; }
  double DisplayRotation() const { return m_rotation; }
  const std::vector<AVMotionVector>& MotionVectors() const {
    return m_motion_vectors;
  }
  std::map<std::string, std::map<std::string, std::string>> Metadata() const;
  uint64_t PacketsRead() const { return m_num_pkt_read; }
  uint64_t PacketsSent() const { return m_num_pkt_sent; }
  uint64_t FramesReceived() const { return m_num_frm_recv; }
  bool GetStreamParams(int idx, StreamParamsC& out) const;

 private:
  enum Status { ST_SUCCESS, ST_ERROR, ST_EOS, ST_MORE, ST_RES_CHANGE };

  void OpenCodec();
  void CloseCodec();
  Status ReadPacket();
  Status SendPacket();
  Status ReceiveFrame();
  void SaveSideData();
  void SavePacketData();
  void SaveCurrentRes();
  int64_t TsFromTime(double ts_sec) const;
  int64_t TsFromFrameNumber(int64_t frame_num) const;
  AVStream* VideoStream() const;

  AVFormatContext* m_fmt_ctx = nullptr;
  AVCodecContext* m_avc_ctx = nullptr;
  AVFrame* m_frame = nullptr;
  AVIOContext* m_io_ctx = nullptr;
  std::queue<AVPacket*> m_pkt_queue;
  AVDictionary* m_options = nullptr;
  std::unique_ptr<TimeoutHandler> m_timeout;

  PacketDataC m_packet_data;
  std::vector<AVMotionVector> m_motion_vectors;
  double m_rotation = 0.0;
  bool m_has_rotation = false;

  // Debug counters (parity: TaskDecodeFrame.cpp:150-164)
  uint64_t m_num_pkt_read = 0;
  uint64_t m_num_pkt_sent = 0;
  uint64_t m_num_frm_recv = 0;

  int m_stream_idx = -1;
  int m_last_w = -1;
  int m_last_h = -1;
  int m_preferred_width = -1;
  int m_mode = 0;
  bool m_end_decode = false;
  bool m_noacpt = false;
  bool m_eof = false;
  bool m_res_change = false;
  bool m_codec_open = false;
  bool m_custom_io_seekable = false;
};

}  // namespace vali
