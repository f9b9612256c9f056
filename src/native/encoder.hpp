/* Host video encoder: libx264/libx265 via libavcodec.
 *
 * Parity target: the reference NVENC encoder task
 * (TaskNvencEncodeFrame.cpp, NvCodecCliOptions.cpp): same 30-key option
 * dict, lazy first-frame setup, SEI insertion, flush semantics,
 * Reconfigure. The ASIC becomes libx264/x265 on host CPU — on TPU systems
 * encode throughput scales with host cores while the TPU handles the
 * pixel transforms.
 */
#pragma once

#include <deque>
#include <vector>

#include "common.hpp"

namespace vali {

class VideoEncoder {
 public:
  VideoEncoder(OptMap opts, PixFmt fmt, bool verbose);
  ~VideoEncoder();

  VideoEncoder(const VideoEncoder&) = delete;
  VideoEncoder& operator=(const VideoEncoder&) = delete;

  /// Encode one host-layout frame (alignment 1). Drains any ready packets
  /// into the internal queue.
  Info EncodeFrame(const uint8_t* data, size_t size, bool force_idr,
                   const uint8_t* sei, size_t sei_size, std::string& msg);

  /// Send EOS and drain everything into the queue.
  Info Flush(std::string& msg);

  /// Pop one elementary-stream packet; false if the queue is empty.
  bool PopPacket(std::vector<uint8_t>& out);

  size_t QueuedPackets() const { return m_queue.size(); }

  /// Close + reopen with merged options (the software analogue of NVENC
  /// Reconfigure). Always produces an IDR at the next frame.
  Info Reconfigure(const OptMap& new_opts, bool force_idr, bool reset_enc,
                   std::string& msg);

  int Width() const { return m_width; }
  int Height() const { return m_height; }
  PixFmt Format() const { return m_fmt; }
  size_t FrameSize() const;
  bool IsHevc() const { return m_is_hevc; }

 private:
  void Open();
  void OpenWithPriv(const AVCodec* codec, AVDictionary* priv);
  void Close();
  Info DrainPackets(std::string& msg);
  void FillFrame(AVFrame* frame, const uint8_t* data);

  OptMap m_opts;
  PixFmt m_fmt = PixFmt::NV12;
  AVCodecContext* m_ctx = nullptr;
  AVFrame* m_frame = nullptr;
  AVPacket* m_pkt = nullptr;
  std::deque<std::vector<uint8_t>> m_queue;
  int m_width = 0;
  int m_height = 0;
  int64_t m_frame_index = 0;
  bool m_is_hevc = false;
  bool m_generic = false;
  bool m_verbose = false;
  bool m_flushed = false;
  AVPixelFormat m_enc_pix_fmt = AV_PIX_FMT_NONE;
};

/// The documented option keys (parity: GetNvencInitParams,
/// NvCodecCliOptions.cpp:46-81). Returned by Python GetNvencParams().
const OptMap& encoder_option_docs();

}  // namespace vali

// Registration hooks used by module.cpp
typedef struct _object PyObject;
int vali_register_encoder(PyObject* module);
int vali_register_frameconv(PyObject* module);
int vali_register_jpeg(PyObject* module);
int vali_register_jpeg_coefficients(PyObject* module);
int vali_register_muxer(PyObject* module);
