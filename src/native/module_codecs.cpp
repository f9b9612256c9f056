/* _native bindings for the encoder, CPU frame converter and JPEG encoder. */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <string>
#include <vector>

#include "common.hpp"
#include "py_util.hpp"
#include "encoder.hpp"
#include "frameconv.hpp"
#include "jpeg.hpp"
#include "muxer.hpp"

namespace {

using vali::Info;
using vali::OptMap;

using vali::optmap_from_pydict;

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------

struct EncoderObject {
  PyObject_HEAD
  vali::VideoEncoder* enc;
};


// Guard against objects whose __init__ never ran (tp_alloc zero-fills).
#define REQUIRE_MEMBER(self, member, what)                                 \
  do {                                                                     \
    if (!(self)->member) {                                                 \
      PyErr_SetString(PyExc_RuntimeError, what " not initialized");        \
      return nullptr;                                                      \
    }                                                                      \
  } while (0)

int Encoder_init(EncoderObject* self, PyObject* args, PyObject* kwds) {
  static const char* kwlist[] = {"opts", "format", "verbose", nullptr};
  PyObject* opts = nullptr;
  int format = static_cast<int>(vali::PixFmt::NV12);
  int verbose = 0;
  if (self->enc) {
    PyErr_SetString(PyExc_RuntimeError,
                    "Encoder is already initialized; create a new one");
    return -1;
  }
  self->enc = nullptr;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "O|ip",
                                   const_cast<char**>(kwlist), &opts, &format,
                                   &verbose)) {
    return -1;
  }
  try {
    self->enc = new vali::VideoEncoder(optmap_from_pydict(opts),
                                       static_cast<vali::PixFmt>(format),
                                       verbose != 0);
    return 0;
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return -1;
  }
}

void Encoder_dealloc(EncoderObject* self) {
  delete self->enc;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* Encoder_encode(EncoderObject* self, PyObject* args,
                         PyObject* kwds) {
  REQUIRE_MEMBER(self, enc, "Encoder");
  static const char* kwlist[] = {"frame", "force_idr", "sei", nullptr};
  PyObject* frame_obj = Py_None;
  int force_idr = 0;
  PyObject* sei_obj = Py_None;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "O|pO",
                                   const_cast<char**>(kwlist), &frame_obj,
                                   &force_idr, &sei_obj)) {
    return nullptr;
  }
  Py_buffer frame_view = {};
  Py_buffer sei_view = {};
  const uint8_t* frame_ptr = nullptr;
  size_t frame_len = 0;
  const uint8_t* sei_ptr = nullptr;
  size_t sei_len = 0;

  if (frame_obj != Py_None) {
    if (PyObject_GetBuffer(frame_obj, &frame_view, PyBUF_SIMPLE) < 0) {
      return nullptr;
    }
    frame_ptr = static_cast<const uint8_t*>(frame_view.buf);
    frame_len = static_cast<size_t>(frame_view.len);
  }
  if (sei_obj != Py_None) {
    if (PyObject_GetBuffer(sei_obj, &sei_view, PyBUF_SIMPLE) < 0) {
      if (frame_ptr) PyBuffer_Release(&frame_view);
      return nullptr;
    }
    sei_ptr = static_cast<const uint8_t*>(sei_view.buf);
    sei_len = static_cast<size_t>(sei_view.len);
  }

  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->enc->EncodeFrame(frame_ptr, frame_len, force_idr != 0,
                                sei_ptr, sei_len, msg);
  Py_END_ALLOW_THREADS

  if (frame_ptr) PyBuffer_Release(&frame_view);
  if (sei_ptr) PyBuffer_Release(&sei_view);
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Encoder_flush(EncoderObject* self, PyObject*) {
  REQUIRE_MEMBER(self, enc, "Encoder");
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->enc->Flush(msg);
  Py_END_ALLOW_THREADS
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Encoder_pop_packet(EncoderObject* self, PyObject*) {
  REQUIRE_MEMBER(self, enc, "Encoder");
  std::vector<uint8_t> pkt;
  if (!self->enc->PopPacket(pkt)) Py_RETURN_NONE;
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(pkt.data()), pkt.size());
}

PyObject* Encoder_reconfigure(EncoderObject* self, PyObject* args,
                              PyObject* kwds) {
  REQUIRE_MEMBER(self, enc, "Encoder");
  static const char* kwlist[] = {"opts", "force_idr", "reset_enc", nullptr};
  PyObject* opts = nullptr;
  int force_idr = 0;
  int reset_enc = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "O|pp",
                                   const_cast<char**>(kwlist), &opts,
                                   &force_idr, &reset_enc)) {
    return nullptr;
  }
  std::string msg;
  Info info;
  try {
    info = self->enc->Reconfigure(optmap_from_pydict(opts), force_idr != 0,
                                  reset_enc != 0, msg);
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return nullptr;
  }
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Encoder_props(EncoderObject* self, PyObject*) {
  REQUIRE_MEMBER(self, enc, "Encoder");
  return Py_BuildValue(
      "{s:i,s:i,s:i,s:n,s:n,s:i}", "width", self->enc->Width(), "height",
      self->enc->Height(), "format", static_cast<int>(self->enc->Format()),
      "frame_size", static_cast<Py_ssize_t>(self->enc->FrameSize()),
      "queued", static_cast<Py_ssize_t>(self->enc->QueuedPackets()),
      "is_hevc", self->enc->IsHevc() ? 1 : 0);
}

PyMethodDef Encoder_methods[] = {
    {"encode", (PyCFunction)Encoder_encode, METH_VARARGS | METH_KEYWORDS,
     "encode(frame, force_idr=False, sei=None) -> (info, msg); frame=None "
     "flushes."},
    {"flush", (PyCFunction)Encoder_flush, METH_NOARGS,
     "Send EOS and drain all packets into the queue."},
    {"pop_packet", (PyCFunction)Encoder_pop_packet, METH_NOARGS,
     "Pop one encoded packet (bytes) or None."},
    {"reconfigure", (PyCFunction)Encoder_reconfigure,
     METH_VARARGS | METH_KEYWORDS, "Merge new options and reopen."},
    {"props", (PyCFunction)Encoder_props, METH_NOARGS, "Encoder properties."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject EncoderType = {PyVarObject_HEAD_INIT(nullptr, 0) "Encoder"};

// ---------------------------------------------------------------------------
// FrameConverter
// ---------------------------------------------------------------------------

struct FrameConvObject {
  PyObject_HEAD
  vali::FrameConverter* conv;
};

int FrameConv_init(FrameConvObject* self, PyObject* args, PyObject* kwds) {
  static const char* kwlist[] = {"width", "height", "src_format",
                                 "dst_format", nullptr};
  int w, h, src_fmt, dst_fmt;
  if (self->conv) {
    PyErr_SetString(PyExc_RuntimeError,
                    "FrameConverter is already initialized; create a new one");
    return -1;
  }
  self->conv = nullptr;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "iiii",
                                   const_cast<char**>(kwlist), &w, &h,
                                   &src_fmt, &dst_fmt)) {
    return -1;
  }
  try {
    self->conv = new vali::FrameConverter(w, h,
                                          static_cast<vali::PixFmt>(src_fmt),
                                          static_cast<vali::PixFmt>(dst_fmt));
    return 0;
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return -1;
  }
}

void FrameConv_dealloc(FrameConvObject* self) {
  delete self->conv;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* FrameConv_run(FrameConvObject* self, PyObject* args) {
  REQUIRE_MEMBER(self, conv, "FrameConverter");
  PyObject* src_obj;
  PyObject* dst_obj;
  int color_space = 2;
  int color_range = 2;
  if (!PyArg_ParseTuple(args, "OO|ii", &src_obj, &dst_obj, &color_space,
                        &color_range)) {
    return nullptr;
  }
  Py_buffer src_view, dst_view;
  if (PyObject_GetBuffer(src_obj, &src_view, PyBUF_SIMPLE) < 0) return nullptr;
  if (PyObject_GetBuffer(dst_obj, &dst_view, PyBUF_WRITABLE) < 0) {
    PyBuffer_Release(&src_view);
    return nullptr;
  }
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->conv->Convert(static_cast<const uint8_t*>(src_view.buf),
                             src_view.len,
                             static_cast<uint8_t*>(dst_view.buf),
                             dst_view.len, color_space, color_range, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src_view);
  PyBuffer_Release(&dst_view);
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* FrameConv_sizes(FrameConvObject* self, PyObject*) {
  REQUIRE_MEMBER(self, conv, "FrameConverter");
  return Py_BuildValue("(nn)",
                       static_cast<Py_ssize_t>(self->conv->SrcSize()),
                       static_cast<Py_ssize_t>(self->conv->DstSize()));
}

PyMethodDef FrameConv_methods[] = {
    {"run", (PyCFunction)FrameConv_run, METH_VARARGS,
     "run(src, dst, color_space=2, color_range=2) -> (info, msg)"},
    {"sizes", (PyCFunction)FrameConv_sizes, METH_NOARGS,
     "(src_size, dst_size) in bytes."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject FrameConvType = {PyVarObject_HEAD_INIT(nullptr, 0)
                                  "FrameConverter"};

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegObject {
  PyObject_HEAD
  vali::JpegEncoder* enc;
};

int Jpeg_init(JpegObject* self, PyObject* args, PyObject* kwds) {
  static const char* kwlist[] = {"quality", "format", nullptr};
  int quality = 85;
  int format = static_cast<int>(vali::PixFmt::RGB);
  if (self->enc) {
    PyErr_SetString(PyExc_RuntimeError,
                    "JpegEncoder is already initialized; create a new one");
    return -1;
  }
  self->enc = nullptr;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "|ii",
                                   const_cast<char**>(kwlist), &quality,
                                   &format)) {
    return -1;
  }
  try {
    self->enc = new vali::JpegEncoder(quality,
                                      static_cast<vali::PixFmt>(format));
    return 0;
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return -1;
  }
}

void Jpeg_dealloc(JpegObject* self) {
  delete self->enc;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* Jpeg_encode(JpegObject* self, PyObject* args) {
  REQUIRE_MEMBER(self, enc, "JpegEncoder");
  PyObject* buf_obj;
  int width, height;
  if (!PyArg_ParseTuple(args, "Oii", &buf_obj, &width, &height)) {
    return nullptr;
  }
  Py_buffer view;
  if (PyObject_GetBuffer(buf_obj, &view, PyBUF_SIMPLE) < 0) return nullptr;
  std::vector<uint8_t> out;
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->enc->Encode(static_cast<const uint8_t*>(view.buf), view.len,
                           width, height, out, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (info != Info::SUCCESS) {
    return Py_BuildValue("(is)", static_cast<int>(info), msg.c_str());
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
  PyObject* result = Py_BuildValue("(iN)", static_cast<int>(info), bytes);
  return result;
}

PyMethodDef Jpeg_methods[] = {
    {"encode", (PyCFunction)Jpeg_encode, METH_VARARGS,
     "encode(frame, width, height) -> (info, jpeg_bytes | msg)"},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject JpegType = {PyVarObject_HEAD_INIT(nullptr, 0) "JpegEncoder"};

// ---------------------------------------------------------------------------
// Muxer
// ---------------------------------------------------------------------------

struct MuxerObject {
  PyObject_HEAD
  vali::Muxer* mux;
};

int Muxer_init(MuxerObject* self, PyObject* args, PyObject* kwds) {
  // order must match the "sii|sisiiO" format units / C varargs below
  static const char* kwlist[] = {"path",   "width",  "height", "codec",
                                 "timebase_den", "format", "fps_num",
                                 "fps_den", "opts", nullptr};
  const char* path;
  const char* codec = "h264";
  int width, height, tb_den = 90000, fps_num = 0, fps_den = 1;
  const char* format = "";
  PyObject* opts = nullptr;
  if (self->mux) {
    PyErr_SetString(PyExc_RuntimeError,
                    "Muxer is already initialized; create a new one");
    return -1;
  }
  self->mux = nullptr;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "sii|sisiiO",
                                   const_cast<char**>(kwlist), &path, &width,
                                   &height, &codec, &tb_den, &format,
                                   &fps_num, &fps_den, &opts)) {
    return -1;
  }
  try {
    self->mux = new vali::Muxer(path, codec, width, height, tb_den, format,
                                fps_num, fps_den, optmap_from_pydict(opts));
    return 0;
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_RuntimeError, e.what());
    return -1;
  }
}

void Muxer_dealloc(MuxerObject* self) {
  delete self->mux;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* Muxer_write(MuxerObject* self, PyObject* args, PyObject* kwds) {
  REQUIRE_MEMBER(self, mux, "Muxer");
  static const char* kwlist[] = {"packet", "pts", "dts", "key", nullptr};
  PyObject* pkt_obj;
  long long pts, dts = LLONG_MIN;
  int key = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "OL|Lp",
                                   const_cast<char**>(kwlist), &pkt_obj,
                                   &pts, &dts, &key)) {
    return nullptr;
  }
  if (dts == LLONG_MIN) dts = pts;
  Py_buffer view;
  if (PyObject_GetBuffer(pkt_obj, &view, PyBUF_SIMPLE) < 0) return nullptr;
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->mux->WritePacket(static_cast<const uint8_t*>(view.buf),
                                view.len, pts, dts, key != 0, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyObject* Muxer_close(MuxerObject* self, PyObject*) {
  REQUIRE_MEMBER(self, mux, "Muxer");
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = self->mux->Close(msg);
  Py_END_ALLOW_THREADS
  return Py_BuildValue("is", static_cast<int>(info), msg.c_str());
}

PyMethodDef Muxer_methods[] = {
    {"write", (PyCFunction)Muxer_write, METH_VARARGS | METH_KEYWORDS,
     "write(packet, pts, dts=pts, key=False) -> (info, msg); timestamps "
     "in 1/timebase_den seconds."},
    {"close", (PyCFunction)Muxer_close, METH_NOARGS,
     "Write the trailer and close the file."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject MuxerType = {PyVarObject_HEAD_INIT(nullptr, 0) "Muxer"};

PyObject* native_encoder_option_docs(PyObject*, PyObject*) {
  PyObject* dict = PyDict_New();
  for (const auto& kv : vali::encoder_option_docs()) {
    PyObject* v = PyUnicode_FromString(kv.second.c_str());
    PyDict_SetItemString(dict, kv.first.c_str(), v);
    Py_DECREF(v);
  }
  return dict;
}

PyMethodDef codec_module_methods[] = {
    {"encoder_option_docs", native_encoder_option_docs, METH_NOARGS,
     "Documented encoder option keys (GetNvencParams parity)."},
    {nullptr, nullptr, 0, nullptr}};

int register_type(PyObject* m, PyTypeObject* type, const char* name,
                  size_t basicsize, initproc init, destructor dealloc,
                  PyMethodDef* methods, const char* doc) {
  type->tp_basicsize = basicsize;
  type->tp_flags = Py_TPFLAGS_DEFAULT;
  type->tp_doc = doc;
  type->tp_new = PyType_GenericNew;
  type->tp_init = init;
  type->tp_dealloc = dealloc;
  type->tp_methods = methods;
  if (PyType_Ready(type) < 0) return -1;
  Py_INCREF(type);
  return PyModule_AddObject(m, name, reinterpret_cast<PyObject*>(type));
}

}  // namespace

int vali_register_encoder(PyObject* m) {
  if (PyModule_AddFunctions(m, codec_module_methods) < 0) return -1;
  return register_type(m, &EncoderType, "Encoder", sizeof(EncoderObject),
                       (initproc)Encoder_init, (destructor)Encoder_dealloc,
                       Encoder_methods, "libx264/x265 video encoder");
}

int vali_register_muxer(PyObject* m) {
  return register_type(m, &MuxerType, "Muxer", sizeof(MuxerObject),
                       (initproc)Muxer_init, (destructor)Muxer_dealloc,
                       Muxer_methods, "libavformat container muxer");
}

int vali_register_frameconv(PyObject* m) {
  return register_type(m, &FrameConvType, "FrameConverter",
                       sizeof(FrameConvObject), (initproc)FrameConv_init,
                       (destructor)FrameConv_dealloc, FrameConv_methods,
                       "swscale CPU frame converter");
}

int vali_register_jpeg(PyObject* m) {
  return register_type(m, &JpegType, "JpegEncoder", sizeof(JpegObject),
                       (initproc)Jpeg_init, (destructor)Jpeg_dealloc,
                       Jpeg_methods, "libjpeg encoder");
}

// --------------------------------------------------------------------------
// TPU-assisted JPEG: entropy-code device-produced DCT coefficients
// --------------------------------------------------------------------------

extern "C" {
// (declared in jpeg.hpp within namespace vali)
}

static PyObject* native_encode_jpeg_coefficients(PyObject*, PyObject* args,
                                                 PyObject* kwds) {
  static const char* kwlist[] = {"y", "cb", "cr", "width", "height",
                                 "subsample420", "quality", "y_bh", "y_bw",
                                 "c_bh", "c_bw", nullptr};
  PyObject* y_obj;
  PyObject* cb_obj = Py_None;
  PyObject* cr_obj = Py_None;
  int width, height, subsample420, quality, y_bh, y_bw, c_bh = 0, c_bw = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwds, "OOOiipiii|ii", const_cast<char**>(kwlist), &y_obj,
          &cb_obj, &cr_obj, &width, &height, &subsample420, &quality, &y_bh,
          &y_bw, &c_bh, &c_bw)) {
    return nullptr;
  }
  Py_buffer yv = {}, cbv = {}, crv = {};
  if (PyObject_GetBuffer(y_obj, &yv, PyBUF_SIMPLE) < 0) return nullptr;
  const int16_t* cb_ptr = nullptr;
  const int16_t* cr_ptr = nullptr;
  if (cb_obj != Py_None && cr_obj != Py_None) {
    if (PyObject_GetBuffer(cb_obj, &cbv, PyBUF_SIMPLE) < 0) {
      PyBuffer_Release(&yv);
      return nullptr;
    }
    if (PyObject_GetBuffer(cr_obj, &crv, PyBUF_SIMPLE) < 0) {
      PyBuffer_Release(&yv);
      PyBuffer_Release(&cbv);
      return nullptr;
    }
    cb_ptr = static_cast<const int16_t*>(cbv.buf);
    cr_ptr = static_cast<const int16_t*>(crv.buf);
  }
  std::vector<uint8_t> out;
  std::string msg;
  Info info;
  Py_BEGIN_ALLOW_THREADS
  info = vali::jpeg_encode_coefficients(
      static_cast<const int16_t*>(yv.buf), y_bh, y_bw, cb_ptr, cr_ptr, c_bh,
      c_bw, width, height, subsample420 != 0, quality, out, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&yv);
  if (cb_ptr) {
    PyBuffer_Release(&cbv);
    PyBuffer_Release(&crv);
  }
  if (info != Info::SUCCESS) {
    return Py_BuildValue("(is)", static_cast<int>(info), msg.c_str());
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size());
  return Py_BuildValue("(iN)", static_cast<int>(info), bytes);
}

static PyMethodDef jpeg_coef_methods[] = {
    {"encode_jpeg_coefficients",
     (PyCFunction)native_encode_jpeg_coefficients,
     METH_VARARGS | METH_KEYWORDS,
     "Entropy-code device-produced quantized DCT coefficients into a JPEG."},
    {nullptr, nullptr, 0, nullptr}};

int vali_register_jpeg_coefficients(PyObject* m) {
  return PyModule_AddFunctions(m, jpeg_coef_methods);
}
