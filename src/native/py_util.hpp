// Shared CPython helpers for the binding translation units.
#pragma once

#include <Python.h>

#include <stdexcept>
#include <string>

#include "common.hpp"

namespace vali {

// Convert a Python dict (or None) into the string->string option map the
// engine consumes. Raises (C++ -> Python) on non-dict input or keys/values
// that cannot be UTF-8 encoded (PyUnicode_AsUTF8 returns NULL for e.g.
// lone surrogates; constructing std::string from NULL is UB).
inline OptMap optmap_from_pydict(PyObject* dict) {
  OptMap opts;
  if (!dict || dict == Py_None) return opts;
  if (!PyDict_Check(dict)) {
    throw std::runtime_error("opts must be a dict of str->str");
  }
  PyObject *key, *value;
  Py_ssize_t pos = 0;
  while (PyDict_Next(dict, &pos, &key, &value)) {
    PyObject* kstr = PyObject_Str(key);
    PyObject* vstr = PyObject_Str(value);
    const char* k = kstr ? PyUnicode_AsUTF8(kstr) : nullptr;
    const char* v = vstr ? PyUnicode_AsUTF8(vstr) : nullptr;
    if (k && v) {
      opts[k] = v;
    }
    Py_XDECREF(kstr);
    Py_XDECREF(vstr);
    if (!k || !v) {
      PyErr_Clear();
      throw std::runtime_error(
          "opts keys/values must be UTF-8 encodable strings");
    }
  }
  return opts;
}

}  // namespace vali
