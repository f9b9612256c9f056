/* _native: CPython extension module for the vali-tpu host engine.
 *
 * Binds the FFmpeg decoder/encoder/converter/JPEG classes with the raw
 * CPython C API (pybind11 is intentionally not a dependency of this build).
 * The Python-facing wrapper classes live in vali_tpu/engine/; this module
 * keeps the interface small: plain ints/floats/bytes/dicts across the
 * boundary, buffers exchanged via the buffer protocol.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <memory>
#include <string>
#include <vector>

#include "common.hpp"
#include "py_util.hpp"
#include "decoder.hpp"
#include "encoder.hpp"
#include "frameconv.hpp"
#include "jpeg.hpp"

namespace {

using vali::Info;
using vali::OptMap;

using vali::optmap_from_pydict;

// ---------------------------------------------------------------------------
// Python file-like -> FFmpeg IO hooks
// ---------------------------------------------------------------------------

int py_reader_read(void* opaque, uint8_t* buf, int buf_size) {
  PyGILState_STATE st = PyGILState_Ensure();
  int result = AVERROR_UNKNOWN;
  PyObject* reader = static_cast<PyObject*>(opaque);
  PyObject* data = PyObject_CallMethod(reader, "read", "i", buf_size);
  if (data) {
    char* ptr = nullptr;
    Py_ssize_t len = 0;
    if (PyBytes_Check(data) &&
        PyBytes_AsStringAndSize(data, &ptr, &len) == 0) {
      if (len > buf_size) {
        // silently truncating would put holes in the bitstream
        result = AVERROR(EIO);
      } else if (len > 0) {
        memcpy(buf, ptr, len);
        result = static_cast<int>(len);
      } else {
        result = AVERROR_EOF;
      }
    }
    Py_DECREF(data);
  }
  if (PyErr_Occurred()) PyErr_Clear();
  PyGILState_Release(st);
  return result;
}

int64_t py_reader_seek(void* opaque, int64_t offset, int whence) {
  if (whence & AVSEEK_SIZE) return AVERROR(ENOSYS);
  if (whence & AVSEEK_FORCE) whence &= ~AVSEEK_FORCE;
  PyGILState_STATE st = PyGILState_Ensure();
  int64_t result = AVERROR_UNKNOWN;
  PyObject* reader = static_cast<PyObject*>(opaque);
  PyObject* pos = PyObject_CallMethod(reader, "seek", "Li", (long long)offset,
                                      whence);
  if (pos) {
    if (pos == Py_None) {
      // py2-style seek() returns None; the position comes from tell()
      Py_DECREF(pos);
      PyObject* told = PyObject_CallMethod(reader, "tell", nullptr);
      if (told) {
        result = PyLong_AsLongLong(told);
        Py_DECREF(told);
      }
    } else {
      result = PyLong_AsLongLong(pos);
      Py_DECREF(pos);
    }
  }
  if (PyErr_Occurred()) {
    PyErr_Clear();
    result = AVERROR_UNKNOWN;
  }
  PyGILState_Release(st);
  return result;
}

// ---------------------------------------------------------------------------
// Decoder type
// ---------------------------------------------------------------------------

struct DecoderObject {
  PyObject_HEAD
  vali::VideoDecoder* dec;
  PyObject* reader;  // strong ref to the BufferedReader-style object
};

// Guard against objects whose __init__ never ran (tp_alloc zero-fills):
// every method would otherwise null-deref and crash the interpreter.
#define REQUIRE_DEC(self)                                                  \
  do {                                                                     \
    if (!(self)->dec) {                                                    \
      PyErr_SetString(PyExc_RuntimeError, "Decoder not initialized");      \
      return nullptr;                                                      \
    }                                                                      \
  } while (0)

int Decoder_init(DecoderObject* self, PyObject* args, PyObject* kwds) {
  static const char* kwlist[] = {"input", "opts", "reader", "probe", nullptr};
  const char* url = nullptr;
  PyObject* opts = nullptr;
  PyObject* reader = nullptr;
  int probe = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "|zOOp",
                                   const_cast<char**>(kwlist), &url, &opts,
                                   &reader, &probe)) {
    return -1;
  }
  if (self->dec) {
    // Re-initializing a live engine would free it while another thread
    // may be executing inside (decode releases the GIL): refuse.
    PyErr_SetString(PyExc_RuntimeError,
                    "Decoder is already initialized; create a new one");
    return -1;
  }
  try {
    OptMap o = optmap_from_pydict(opts);
    vali::IoHooks hooks;
    vali::IoHooks* hooks_ptr = nullptr;
    if (reader && reader != Py_None) {
      if (!PyObject_HasAttrString(reader, "read")) {
        PyErr_SetString(PyExc_TypeError,
                        "reader object must have a .read method");
        return -1;
      }
      Py_INCREF(reader);
      self->reader = reader;
      hooks.opaque = reader;
      hooks.read = py_reader_read;
      hooks.seek = py_reader_seek;
      hooks.seekable = PyObject_HasAttrString(reader, "seek") != 0;
      hooks_ptr = &hooks;
    }
    self->dec = new vali::VideoDecoder(url ? url : "", o, hooks_ptr,
                                       probe != 0);
    return 0;
  } catch (const std::exception& e) {
    Py_CLEAR(self->reader);
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return -1;
  }
}

int Decoder_traverse(DecoderObject* self, visitproc visit, void* arg) {
  Py_VISIT(self->reader);
  return 0;
}

int Decoder_clear_refs(DecoderObject* self) {
  Py_CLEAR(self->reader);
  return 0;
}

void Decoder_dealloc(DecoderObject* self) {
  PyObject_GC_UnTrack(self);
  delete self->dec;
  Py_CLEAR(self->reader);
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* Decoder_decode(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  try {
    info = self->dec->DecodeNext(msg);
  } catch (const std::exception& e) {  // never unwind through C frames
    info = Info::FAIL;
    msg = e.what();
  }
  Py_END_ALLOW_THREADS
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Decoder_seek(DecoderObject* self, PyObject* args) {
  REQUIRE_DEC(self);
  long long frame_num = 0;
  double ts_sec = 0.0;
  int by_number = 0;
  if (!PyArg_ParseTuple(args, "Ldi", &frame_num, &ts_sec, &by_number)) {
    return nullptr;
  }
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  try {
    info = self->dec->Seek(frame_num, ts_sec, by_number != 0, msg);
  } catch (const std::exception& e) {  // never unwind through C frames
    info = Info::FAIL;
    msg = e.what();
  }
  Py_END_ALLOW_THREADS
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Decoder_copy_frame(DecoderObject* self, PyObject* args) {
  REQUIRE_DEC(self);
  PyObject* buf_obj = nullptr;
  if (!PyArg_ParseTuple(args, "O", &buf_obj)) return nullptr;
  Py_buffer view;
  if (PyObject_GetBuffer(buf_obj, &view, PyBUF_WRITABLE) < 0) return nullptr;
  int written;
  try {
    written = self->dec->CopyFrame(static_cast<uint8_t*>(view.buf),
                                   static_cast<size_t>(view.len));
  } catch (const std::exception&) {  // e.g. bad_alloc in the P012 repack
    written = -1;
  }
  PyBuffer_Release(&view);
  return PyLong_FromLong(written);
}

PyObject* Decoder_props(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  vali::VideoDecoder* d = self->dec;
  PyObject* dict = PyDict_New();
  auto set = [&](const char* k, PyObject* v) {
    PyDict_SetItemString(dict, k, v);
    Py_DECREF(v);
  };
  set("width", PyLong_FromLong(d->Width()));
  set("height", PyLong_FromLong(d->Height()));
  set("level", PyLong_FromLong(d->Level()));
  set("profile", PyLong_FromLong(d->Profile()));
  set("delay", PyLong_FromLong(d->Delay()));
  set("gop_size", PyLong_FromLong(d->GopSize()));
  set("bitrate", PyLong_FromLongLong(d->Bitrate()));
  set("num_frames", PyLong_FromLongLong(d->NumFrames()));
  set("num_streams", PyLong_FromLong(d->NumStreams()));
  set("stream_index", PyLong_FromLong(d->StreamIndex()));
  set("host_frame_size", PyLong_FromLong(d->HostFrameSize()));
  set("framerate", PyFloat_FromDouble(d->FrameRate()));
  set("avg_framerate", PyFloat_FromDouble(d->AvgFrameRate()));
  set("timebase", PyFloat_FromDouble(d->TimeBase()));
  set("start_time", PyFloat_FromDouble(d->StartTime()));
  set("duration", PyFloat_FromDouble(d->Duration()));
  set("color_space", PyLong_FromLong(d->ColorSpaceId()));
  set("color_range", PyLong_FromLong(d->ColorRangeId()));
  set("format", PyLong_FromLong(static_cast<int>(d->Format())));
  set("is_vfr", PyBool_FromLong(d->IsVFR() ? 1 : 0));
  set("mode", PyLong_FromLong(d->Mode()));
  set("num_pkt_read", PyLong_FromUnsignedLongLong(d->PacketsRead()));
  set("num_pkt_sent", PyLong_FromUnsignedLongLong(d->PacketsSent()));
  set("num_frm_recv", PyLong_FromUnsignedLongLong(d->FramesReceived()));
  return dict;
}

PyObject* Decoder_packet_data(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  const vali::PacketDataC& p = self->dec->LastPacketData();
  return Py_BuildValue("{s:L,s:L,s:L,s:L,s:L,s:L}", "pts", p.pts, "dts",
                       p.dts, "pos", p.pos, "bsl", p.bsl, "duration",
                       p.duration, "key", p.key);
}

PyObject* Decoder_motion_vectors(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  const auto& mvs = self->dec->MotionVectors();
  PyObject* list = PyList_New(mvs.size());
  if (!list) return nullptr;
  for (size_t i = 0; i < mvs.size(); i++) {
    const AVMotionVector& m = mvs[i];
    PyObject* t = Py_BuildValue(
        "(i,i,i,i,i,i,i,i,i,i)", static_cast<int>(m.source),
        static_cast<int>(m.w), static_cast<int>(m.h),
        static_cast<int>(m.src_x), static_cast<int>(m.src_y),
        static_cast<int>(m.dst_x), static_cast<int>(m.dst_y),
        static_cast<int>(m.motion_x), static_cast<int>(m.motion_y),
        static_cast<int>(m.motion_scale));
    if (!t) {
      Py_DECREF(list);
      return nullptr;
    }
    PyList_SET_ITEM(list, i, t);
  }
  return list;
}

// Packed int32 MV records for a vectorized numpy view on the Python side
// (parity: the reference registers a numpy dtype for MotionVector and
// returns a structured array, VALI.cpp:125-128). Layout: 10 little-endian
// int32 per vector — source,w,h,src_x,src_y,dst_x,dst_y,motion_x,motion_y,
// motion_scale — matching the all-int struct in VALI.hpp:46-56.
PyObject* Decoder_motion_vectors_packed(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  const auto& mvs = self->dec->MotionVectors();
  const Py_ssize_t nbytes =
      static_cast<Py_ssize_t>(mvs.size()) * 10 * sizeof(int32_t);
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, nbytes);
  if (!bytes) return nullptr;
  auto* out = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(bytes));
  for (size_t i = 0; i < mvs.size(); i++) {
    const AVMotionVector& m = mvs[i];
    int32_t* r = out + i * 10;
    r[0] = static_cast<int32_t>(m.source);
    r[1] = static_cast<int32_t>(m.w);
    r[2] = static_cast<int32_t>(m.h);
    r[3] = static_cast<int32_t>(m.src_x);
    r[4] = static_cast<int32_t>(m.src_y);
    r[5] = static_cast<int32_t>(m.dst_x);
    r[6] = static_cast<int32_t>(m.dst_y);
    r[7] = static_cast<int32_t>(m.motion_x);
    r[8] = static_cast<int32_t>(m.motion_y);
    r[9] = static_cast<int32_t>(m.motion_scale);
  }
  return bytes;
}

PyObject* Decoder_display_rotation(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  if (!self->dec->HasDisplayRotation()) {
    // parity: reference returns 361.0 when no display matrix present
    return PyFloat_FromDouble(361.0);
  }
  return PyFloat_FromDouble(self->dec->DisplayRotation());
}

PyObject* Decoder_metadata(DecoderObject* self, PyObject*) {
  REQUIRE_DEC(self);
  auto md = self->dec->Metadata();
  PyObject* outer = PyDict_New();
  for (auto& src : md) {
    PyObject* inner = PyDict_New();
    for (auto& kv : src.second) {
      PyObject* v = PyUnicode_FromString(kv.second.c_str());
      PyDict_SetItemString(inner, kv.first.c_str(), v);
      Py_DECREF(v);
    }
    PyDict_SetItemString(outer, src.first.c_str(), inner);
    Py_DECREF(inner);
  }
  return outer;
}

PyObject* stream_params_to_dict(const vali::StreamParamsC& p) {
  return Py_BuildValue(
      "{s:i,s:i,s:I,s:i,s:d,s:d,s:d,s:L,s:d,s:d,s:L,s:L,s:i,s:i,s:i,s:i}",
      "width", p.width, "height", p.height, "fourcc", p.fourcc, "codec_id",
      p.codec_id, "fps", p.fps, "avg_fps", p.avg_fps, "time_base",
      p.time_base, "start_time", p.start_time, "start_time_sec",
      p.start_time_sec, "duration_sec", p.duration_sec, "bit_rate",
      p.bit_rate, "num_frames", p.num_frames, "profile", p.profile, "level",
      p.level, "color_space", p.color_space, "color_range", p.color_range);
}

PyObject* Decoder_stream_params(DecoderObject* self, PyObject* args) {
  REQUIRE_DEC(self);
  int idx = 0;
  if (!PyArg_ParseTuple(args, "i", &idx)) return nullptr;
  vali::StreamParamsC p;
  if (!self->dec->GetStreamParams(idx, p)) Py_RETURN_NONE;
  return stream_params_to_dict(p);
}

PyObject* Decoder_set_mode(DecoderObject* self, PyObject* args) {
  REQUIRE_DEC(self);
  int mode = 0;
  if (!PyArg_ParseTuple(args, "i", &mode)) return nullptr;
  self->dec->SetMode(mode);
  Py_RETURN_NONE;
}

PyMethodDef Decoder_methods[] = {
    {"decode", (PyCFunction)Decoder_decode, METH_NOARGS,
     "Decode next frame; returns (info, msg)."},
    {"seek", (PyCFunction)Decoder_seek, METH_VARARGS,
     "seek(frame, tssec, by_number) -> (info, msg)."},
    {"copy_frame", (PyCFunction)Decoder_copy_frame, METH_VARARGS,
     "Copy pending frame into a writable buffer; returns bytes written."},
    {"props", (PyCFunction)Decoder_props, METH_NOARGS,
     "All stream/codec properties as a dict."},
    {"packet_data", (PyCFunction)Decoder_packet_data, METH_NOARGS,
     "Packet data of the last decoded frame."},
    {"motion_vectors", (PyCFunction)Decoder_motion_vectors, METH_NOARGS,
     "Motion vectors of the last decoded frame as tuples."},
    {"motion_vectors_packed", (PyCFunction)Decoder_motion_vectors_packed,
     METH_NOARGS,
     "Motion vectors packed as 10 little-endian int32 per record."},
    {"display_rotation", (PyCFunction)Decoder_display_rotation, METH_NOARGS,
     "Display rotation in degrees, 361.0 if absent."},
    {"metadata", (PyCFunction)Decoder_metadata, METH_NOARGS,
     "Container + video stream metadata."},
    {"stream_params", (PyCFunction)Decoder_stream_params, METH_VARARGS,
     "Per-stream parameters dict (None for non-video streams)."},
    {"set_mode", (PyCFunction)Decoder_set_mode, METH_VARARGS,
     "Set decode mode (0=ALL_FRAMES, 1=KEY_FRAMES)."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject DecoderType = {PyVarObject_HEAD_INIT(nullptr, 0) "Decoder"};

// ---------------------------------------------------------------------------
// module
// ---------------------------------------------------------------------------

PyObject* native_set_log_level(PyObject*, PyObject* args) {
  int level = 0;
  if (!PyArg_ParseTuple(args, "i", &level)) return nullptr;
  av_log_set_level(level);
  Py_RETURN_NONE;
}

PyMethodDef native_methods[] = {
    {"set_ffmpeg_log_level", native_set_log_level, METH_VARARGS,
     "Set the global FFmpeg log level (AV_LOG_* value)."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef native_module = {PyModuleDef_HEAD_INIT,
                             "_native",
                             "vali-tpu host engine (FFmpeg demux/decode/"
                             "encode, swscale, libjpeg)",
                             -1,
                             native_methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  av_log_set_level(AV_LOG_ERROR);

  DecoderType.tp_basicsize = sizeof(DecoderObject);
  // HAVE_GC: the reader ref can participate in cycles (stream adapters
  // holding back-refs); without traverse/clear those cycles leak the
  // decoder's open file descriptors
  DecoderType.tp_flags = Py_TPFLAGS_DEFAULT | Py_TPFLAGS_HAVE_GC;
  DecoderType.tp_traverse = (traverseproc)Decoder_traverse;
  DecoderType.tp_clear = (inquiry)Decoder_clear_refs;
  DecoderType.tp_doc = "FFmpeg demux+decode engine";
  DecoderType.tp_new = PyType_GenericNew;
  DecoderType.tp_init = (initproc)Decoder_init;
  DecoderType.tp_dealloc = (destructor)Decoder_dealloc;
  DecoderType.tp_methods = Decoder_methods;
  if (PyType_Ready(&DecoderType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&native_module);
  if (!m) return nullptr;

  Py_INCREF(&DecoderType);
  PyModule_AddObject(m, "Decoder", reinterpret_cast<PyObject*>(&DecoderType));

  // single source of truth for the CopyFrame sentinel (decoder.hpp);
  // the Python wrapper maps it to TaskExecInfo.UNSUPPORTED_FMT_CONV_PARAMS
  if (PyModule_AddIntConstant(
          m, "ERR_UNREPRESENTABLE_LAYOUT",
          vali::VideoDecoder::kErrUnrepresentableLayout) < 0) {
    Py_DECREF(m);
    return nullptr;
  }

  if (vali_register_encoder(m) < 0 || vali_register_frameconv(m) < 0 ||
      vali_register_jpeg(m) < 0 || vali_register_jpeg_coefficients(m) < 0 ||
      vali_register_muxer(m) < 0) {
    Py_DECREF(m);
    return nullptr;
  }
  return m;
}
