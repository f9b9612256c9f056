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
  // Accept str directly and int/float via str() (safe __str__); reject
  // everything else — PyObject_Str on arbitrary objects would mangle
  // bytes to "b'..'" and could run user __str__ that mutates the dict
  // mid-PyDict_Next.
  auto as_string = [](PyObject* o, std::string& out) -> bool {
    PyObject* str_obj = nullptr;
    if (PyUnicode_Check(o)) {
      str_obj = Py_NewRef(o);
    } else if (PyLong_Check(o) || PyFloat_Check(o)) {
      str_obj = PyObject_Str(o);
    }
    const char* c = str_obj ? PyUnicode_AsUTF8(str_obj) : nullptr;
    if (c) out = c;
    Py_XDECREF(str_obj);
    return c != nullptr;
  };
  PyObject *key, *value;
  Py_ssize_t pos = 0;
  while (PyDict_Next(dict, &pos, &key, &value)) {
    std::string k, v;
    if (!as_string(key, k) || !as_string(value, v)) {
      PyErr_Clear();
      throw std::runtime_error(
          "opts keys/values must be str (or int/float values)");
    }
    opts[k] = v;
  }
  return opts;
}

}  // namespace vali
