/* Runtime (dlopen) loading of the FFmpeg shared libraries.
 *
 * Parity target: the reference's LibraryLoader/LibCuda dlopen shims
 * (src/TC/src/LibraryLoader.hpp:23-68, LibCuda.cpp, LibNpp.cpp) — the
 * wheel carries no hard link-time dependency on its accelerator
 * libraries. The TPU build's runtime is JAX (nothing to dlopen), so the
 * property applies to FFmpeg instead: the extension imports without the
 * libav* libraries installed, and every call site resolves its symbol
 * lazily on first use, with versioned-soname fallback across FFmpeg
 * 4.x-7.x.
 *
 * Mechanics: this header is included from common.hpp AFTER all libav
 * headers. Each used function gets a typed lazy-resolving wrapper (the
 * exact type comes from decltype of the header declaration), then a
 * macro renames subsequent call sites onto the wrapper. Include guards
 * keep later libav includes from re-declaring under the renamed names.
 *
 * Build with -DVALI_DIRECT_LINK to link libav normally instead (and add
 * the -lav* flags back; see setup.py).
 */
#pragma once

#ifndef VALI_DIRECT_LINK

#include <dlfcn.h>

#include <mutex>
#include <stdexcept>
#include <string>
#include <utility>

namespace vali_dl {

enum Lib { kAvUtil = 0, kAvCodec = 1, kAvFormat = 2, kSwScale = 3 };

inline void* lib_handle(Lib which) {
  static void* handles[4];
  static std::once_flag once;
  std::call_once(once, [] {
    const char* bases[4] = {"avutil", "avcodec", "avformat", "swscale"};
    auto try_set = [&](auto name_for) -> bool {
      for (int i = 0; i < 4; i++) {
        // avutil first: the others depend on it (RTLD_GLOBAL exports it)
        handles[i] = dlopen(name_for(i).c_str(), RTLD_NOW | RTLD_GLOBAL);
        if (!handles[i]) {
          for (int j = 0; j < i; j++) {
            if (handles[j]) dlclose(handles[j]);
            handles[j] = nullptr;
          }
          handles[i] = nullptr;
          return false;
        }
      }
      return true;
    };
    // Unversioned first (the dynamic linker resolves a consistent set),
    // then KNOWN-CONSISTENT major sets per FFmpeg release — never mix
    // majors across libs (AVFrame/SwsContext layouts differ and mixing
    // corrupts memory instead of failing cleanly).
    if (try_set([&](int i) { return std::string("lib") + bases[i] + ".so"; }))
      return;
    static const int sets[5][4] = {
        {60, 62, 62, 9},  // FFmpeg 8.x
        {59, 61, 61, 8},  // FFmpeg 7.x
        {58, 60, 60, 7},  // FFmpeg 6.x
        {57, 59, 59, 6},  // FFmpeg 5.x
        {56, 58, 58, 5},  // FFmpeg 4.x
    };
    for (const auto& ver : sets) {
      if (try_set([&](int i) {
            return std::string("lib") + bases[i] + ".so." +
                   std::to_string(ver[i]);
          }))
        return;
    }
  });
  return handles[which];
}

template <typename F>
F* sym(Lib lib, const char* name) {
  void* h = lib_handle(lib);
  void* p = h ? dlsym(h, name) : nullptr;
  if (!p) {
    throw std::runtime_error(
        std::string("vali-tpu: FFmpeg runtime function unavailable: ") +
        name +
        " — install the FFmpeg shared libraries (libavformat/libavcodec/"
        "libavutil/libswscale)");
  }
  return reinterpret_cast<F*>(p);
}

}  // namespace vali_dl

#define VALI_AV_WRAP(LIB, NAME)                                          \
  template <typename... A>                                               \
  inline decltype(auto) NAME##_vali_dl(A&&... a) {                       \
    static auto* fp =                                                    \
        ::vali_dl::sym<decltype(::NAME)>(::vali_dl::LIB, #NAME);         \
    return fp(std::forward<A>(a)...);                                    \
  }

// ---- libavutil ----------------------------------------------------------
VALI_AV_WRAP(kAvUtil, av_dict_copy)
VALI_AV_WRAP(kAvUtil, av_dict_free)
VALI_AV_WRAP(kAvUtil, av_dict_get)
VALI_AV_WRAP(kAvUtil, av_dict_set)
VALI_AV_WRAP(kAvUtil, av_display_rotation_get)
VALI_AV_WRAP(kAvUtil, av_frame_alloc)
VALI_AV_WRAP(kAvUtil, av_frame_free)
VALI_AV_WRAP(kAvUtil, av_frame_get_buffer)
VALI_AV_WRAP(kAvUtil, av_frame_get_side_data)
VALI_AV_WRAP(kAvUtil, av_frame_make_writable)
VALI_AV_WRAP(kAvUtil, av_frame_new_side_data)
VALI_AV_WRAP(kAvUtil, av_frame_remove_side_data)
VALI_AV_WRAP(kAvUtil, av_free)
VALI_AV_WRAP(kAvUtil, av_freep)
VALI_AV_WRAP(kAvUtil, av_get_pix_fmt_name)
VALI_AV_WRAP(kAvUtil, av_image_copy)
VALI_AV_WRAP(kAvUtil, av_image_copy_to_buffer)
VALI_AV_WRAP(kAvUtil, av_image_fill_arrays)
VALI_AV_WRAP(kAvUtil, av_image_get_buffer_size)
VALI_AV_WRAP(kAvUtil, av_log_set_level)
VALI_AV_WRAP(kAvUtil, av_malloc)
VALI_AV_WRAP(kAvUtil, av_mallocz)
VALI_AV_WRAP(kAvUtil, av_rescale_q)
VALI_AV_WRAP(kAvUtil, av_strerror)
// ---- libavcodec ---------------------------------------------------------
VALI_AV_WRAP(kAvCodec, av_new_packet)
VALI_AV_WRAP(kAvCodec, av_packet_alloc)
VALI_AV_WRAP(kAvCodec, av_packet_free)
VALI_AV_WRAP(kAvCodec, av_packet_rescale_ts)
VALI_AV_WRAP(kAvCodec, av_packet_unref)
VALI_AV_WRAP(kAvCodec, avcodec_alloc_context3)
VALI_AV_WRAP(kAvCodec, avcodec_find_decoder)
VALI_AV_WRAP(kAvCodec, avcodec_descriptor_get_by_name)
VALI_AV_WRAP(kAvCodec, avcodec_find_encoder)
VALI_AV_WRAP(kAvCodec, avcodec_find_encoder_by_name)
VALI_AV_WRAP(kAvCodec, avcodec_flush_buffers)
VALI_AV_WRAP(kAvCodec, avcodec_free_context)
VALI_AV_WRAP(kAvCodec, avcodec_get_name)
VALI_AV_WRAP(kAvCodec, avcodec_open2)
VALI_AV_WRAP(kAvCodec, avcodec_parameters_to_context)
VALI_AV_WRAP(kAvCodec, avcodec_receive_frame)
VALI_AV_WRAP(kAvCodec, avcodec_receive_packet)
VALI_AV_WRAP(kAvCodec, avcodec_send_frame)
VALI_AV_WRAP(kAvCodec, avcodec_send_packet)
// ---- libavformat --------------------------------------------------------
VALI_AV_WRAP(kAvFormat, av_find_best_stream)
VALI_AV_WRAP(kAvFormat, av_interleaved_write_frame)
VALI_AV_WRAP(kAvFormat, av_probe_input_format)
VALI_AV_WRAP(kAvFormat, av_read_frame)
VALI_AV_WRAP(kAvFormat, av_write_trailer)
VALI_AV_WRAP(kAvFormat, avformat_alloc_context)
VALI_AV_WRAP(kAvFormat, avformat_alloc_output_context2)
VALI_AV_WRAP(kAvFormat, avformat_close_input)
VALI_AV_WRAP(kAvFormat, avformat_find_stream_info)
VALI_AV_WRAP(kAvFormat, avformat_free_context)
VALI_AV_WRAP(kAvFormat, avformat_new_stream)
VALI_AV_WRAP(kAvFormat, avformat_open_input)
VALI_AV_WRAP(kAvFormat, avformat_seek_file)
VALI_AV_WRAP(kAvFormat, avformat_write_header)
VALI_AV_WRAP(kAvFormat, avio_alloc_context)
VALI_AV_WRAP(kAvFormat, avio_closep)
VALI_AV_WRAP(kAvFormat, avio_context_free)
VALI_AV_WRAP(kAvFormat, avio_open)
// ---- libswscale ---------------------------------------------------------
VALI_AV_WRAP(kSwScale, sws_freeContext)
VALI_AV_WRAP(kSwScale, sws_getCachedContext)
VALI_AV_WRAP(kSwScale, sws_getCoefficients)
VALI_AV_WRAP(kSwScale, sws_getColorspaceDetails)
VALI_AV_WRAP(kSwScale, sws_scale)
VALI_AV_WRAP(kSwScale, sws_setColorspaceDetails)

#undef VALI_AV_WRAP

// Redirect every subsequent call site onto the lazy wrappers.
#define av_dict_copy av_dict_copy_vali_dl
#define av_dict_free av_dict_free_vali_dl
#define av_dict_get av_dict_get_vali_dl
#define av_dict_set av_dict_set_vali_dl
#define av_display_rotation_get av_display_rotation_get_vali_dl
#define av_frame_alloc av_frame_alloc_vali_dl
#define av_frame_free av_frame_free_vali_dl
#define av_frame_get_buffer av_frame_get_buffer_vali_dl
#define av_frame_get_side_data av_frame_get_side_data_vali_dl
#define av_frame_make_writable av_frame_make_writable_vali_dl
#define av_frame_new_side_data av_frame_new_side_data_vali_dl
#define av_frame_remove_side_data av_frame_remove_side_data_vali_dl
#define av_free av_free_vali_dl
#define av_freep av_freep_vali_dl
#define av_get_pix_fmt_name av_get_pix_fmt_name_vali_dl
#define av_image_copy av_image_copy_vali_dl
#define av_image_copy_to_buffer av_image_copy_to_buffer_vali_dl
#define av_image_fill_arrays av_image_fill_arrays_vali_dl
#define av_image_get_buffer_size av_image_get_buffer_size_vali_dl
#define av_log_set_level av_log_set_level_vali_dl
#define av_malloc av_malloc_vali_dl
#define av_mallocz av_mallocz_vali_dl
#define av_rescale_q av_rescale_q_vali_dl
#define av_strerror av_strerror_vali_dl
#define av_new_packet av_new_packet_vali_dl
#define av_packet_alloc av_packet_alloc_vali_dl
#define av_packet_free av_packet_free_vali_dl
#define av_packet_rescale_ts av_packet_rescale_ts_vali_dl
#define av_packet_unref av_packet_unref_vali_dl
#define avcodec_alloc_context3 avcodec_alloc_context3_vali_dl
#define avcodec_find_decoder avcodec_find_decoder_vali_dl
#define avcodec_descriptor_get_by_name avcodec_descriptor_get_by_name_vali_dl
#define avcodec_find_encoder avcodec_find_encoder_vali_dl
#define avcodec_find_encoder_by_name avcodec_find_encoder_by_name_vali_dl
#define avcodec_flush_buffers avcodec_flush_buffers_vali_dl
#define avcodec_free_context avcodec_free_context_vali_dl
#define avcodec_get_name avcodec_get_name_vali_dl
#define avcodec_open2 avcodec_open2_vali_dl
#define avcodec_parameters_to_context avcodec_parameters_to_context_vali_dl
#define avcodec_receive_frame avcodec_receive_frame_vali_dl
#define avcodec_receive_packet avcodec_receive_packet_vali_dl
#define avcodec_send_frame avcodec_send_frame_vali_dl
#define avcodec_send_packet avcodec_send_packet_vali_dl
#define av_find_best_stream av_find_best_stream_vali_dl
#define av_interleaved_write_frame av_interleaved_write_frame_vali_dl
#define av_probe_input_format av_probe_input_format_vali_dl
#define av_read_frame av_read_frame_vali_dl
#define av_write_trailer av_write_trailer_vali_dl
#define avformat_alloc_context avformat_alloc_context_vali_dl
#define avformat_alloc_output_context2 avformat_alloc_output_context2_vali_dl
#define avformat_close_input avformat_close_input_vali_dl
#define avformat_find_stream_info avformat_find_stream_info_vali_dl
#define avformat_free_context avformat_free_context_vali_dl
#define avformat_new_stream avformat_new_stream_vali_dl
#define avformat_open_input avformat_open_input_vali_dl
#define avformat_seek_file avformat_seek_file_vali_dl
#define avformat_write_header avformat_write_header_vali_dl
#define avio_alloc_context avio_alloc_context_vali_dl
#define avio_closep avio_closep_vali_dl
#define avio_context_free avio_context_free_vali_dl
#define avio_open avio_open_vali_dl
#define sws_freeContext sws_freeContext_vali_dl
#define sws_getCachedContext sws_getCachedContext_vali_dl
#define sws_getCoefficients sws_getCoefficients_vali_dl
#define sws_getColorspaceDetails sws_getColorspaceDetails_vali_dl
#define sws_scale sws_scale_vali_dl
#define sws_setColorspaceDetails sws_setColorspaceDetails_vali_dl

#endif  // VALI_DIRECT_LINK
