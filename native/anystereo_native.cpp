// anystereo_native — C++ data-path hot loops for the TPU stereo framework.
//
// Role: the reference's native surface is a CUDA correlation sampler
// (sampler/sampler.cpp, sampler_kernel.cu) whose compute role is taken by
// Pallas on TPU; the framework's remaining native-worthy hot path is the
// host-side data pipeline feeding the chips.  This module implements, with
// the CPython C API + NumPy (no pybind11 in the image):
//
//   read_pfm(path)                      -> float32 [H,W] or [H,W,3] ndarray
//       PFM decode + vertical flip in one pass (spec:
//       models/coreContinuous_IGEV/utils/frame_utils.py:34-69).
//   scatter_resize_sparse(flow, valid, fx, fy) -> (flow', valid')
//       sparse flow-map rescale by scatter (spec: utils/augmentor.py:363-395).
//   sample_queries(values, coords, idx) -> gathered values
//       fused query-subsample gather for the multi-scale sampler
//       (spec: stereo_datasets.py:167-193).
//
// Build: python native/setup.py build_ext --inplace  (see data/native_io.py
// for the lazy autobuild + pure-python fallback).

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- //
// read_pfm
// ----------------------------------------------------------------- //

bool read_line(FILE* f, std::string* out) {
  out->clear();
  int c;
  while ((c = fgetc(f)) != EOF) {
    if (c == '\n') return true;
    out->push_back(static_cast<char>(c));
  }
  return !out->empty();
}

PyObject* py_read_pfm(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  std::string header, dims, scale_line;
  if (!read_line(f, &header) || (header != "PF" && header != "Pf")) {
    fclose(f);
    PyErr_Format(PyExc_ValueError, "%s: not a PFM file", path);
    return nullptr;
  }
  const bool color = header == "PF";
  long width = 0, height = 0;
  if (!read_line(f, &dims) ||
      sscanf(dims.c_str(), "%ld %ld", &width, &height) != 2 || width <= 0 ||
      height <= 0) {
    fclose(f);
    PyErr_Format(PyExc_ValueError, "%s: malformed PFM header", path);
    return nullptr;
  }
  if (!read_line(f, &scale_line)) {
    fclose(f);
    PyErr_Format(PyExc_ValueError, "%s: missing PFM scale", path);
    return nullptr;
  }
  const double scale = atof(scale_line.c_str());
  const bool little_endian = scale < 0;

  const npy_intp ch = color ? 3 : 1;
  const size_t count = static_cast<size_t>(width) * height * ch;
  // guard against corrupt headers: a bogus dims line must raise, not
  // request petabytes (uncaught std::bad_alloc would std::terminate the
  // whole training process through the C API boundary)
  if (count > (1ull << 31)) {
    fclose(f);
    PyErr_Format(PyExc_ValueError, "%s: implausible PFM dims %ldx%ld", path,
                 width, height);
    return nullptr;
  }
  std::vector<float> buf;
  try {
    buf.resize(count);
  } catch (const std::bad_alloc&) {
    fclose(f);
    PyErr_NoMemory();
    return nullptr;
  }
  const size_t got = fread(buf.data(), sizeof(float), count, f);
  fclose(f);
  if (got != count) {
    PyErr_Format(PyExc_ValueError, "%s: truncated PFM payload", path);
    return nullptr;
  }
  if (!little_endian) {
    for (size_t i = 0; i < count; ++i) {
      uint32_t v;
      memcpy(&v, &buf[i], 4);
      v = __builtin_bswap32(v);
      memcpy(&buf[i], &v, 4);
    }
  }

  npy_intp shape2[2] = {height, width};
  npy_intp shape3[3] = {height, width, 3};
  PyObject* arr =
      color ? PyArray_SimpleNew(3, shape3, NPY_FLOAT32)
            : PyArray_SimpleNew(2, shape2, NPY_FLOAT32);
  if (!arr) return nullptr;
  float* out = static_cast<float*>(PyArray_DATA((PyArrayObject*)arr));
  const size_t row = static_cast<size_t>(width) * ch;
  // PFM rows are stored bottom-up: flip while copying.
  for (long y = 0; y < height; ++y) {
    memcpy(out + static_cast<size_t>(y) * row,
           buf.data() + static_cast<size_t>(height - 1 - y) * row,
           row * sizeof(float));
  }
  return arr;
}

// ----------------------------------------------------------------- //
// scatter_resize_sparse
// ----------------------------------------------------------------- //

PyObject* py_scatter_resize_sparse(PyObject*, PyObject* args) {
  PyArrayObject *flow_o = nullptr, *valid_o = nullptr;
  double fx, fy;
  if (!PyArg_ParseTuple(args, "O!O!dd", &PyArray_Type, &flow_o, &PyArray_Type,
                        &valid_o, &fx, &fy))
    return nullptr;

  PyArrayObject* flow = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)flow_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  PyArrayObject* valid = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)valid_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  if (!flow || !valid) {
    Py_XDECREF(flow);
    Py_XDECREF(valid);
    return nullptr;
  }
  if (PyArray_NDIM(flow) != 3 || PyArray_DIM(flow, 2) != 2 ||
      PyArray_NDIM(valid) != 2 ||
      PyArray_DIM(valid, 0) != PyArray_DIM(flow, 0) ||
      PyArray_DIM(valid, 1) != PyArray_DIM(flow, 1)) {
    Py_DECREF(flow);
    Py_DECREF(valid);
    PyErr_SetString(PyExc_ValueError,
                    "flow must be [H,W,2] with valid [H,W] of the same H,W");
    return nullptr;
  }
  const long ht = PyArray_DIM(flow, 0), wd = PyArray_DIM(flow, 1);
  // nearbyint = round-half-to-even, matching numpy/python round() in the
  // pure-python fallback (lround rounds half away from zero and would
  // disagree on exact-.5 products — different output shapes per path)
  const long ht1 = static_cast<long>(std::nearbyint(ht * fy));
  const long wd1 = static_cast<long>(std::nearbyint(wd * fx));

  npy_intp fshape[3] = {ht1, wd1, 2};
  npy_intp vshape[2] = {ht1, wd1};
  PyObject* flow_out = PyArray_ZEROS(3, fshape, NPY_FLOAT32, 0);
  PyObject* valid_out = PyArray_ZEROS(2, vshape, NPY_INT32, 0);
  if (!flow_out || !valid_out) {
    Py_DECREF(flow);
    Py_DECREF(valid);
    Py_XDECREF(flow_out);
    Py_XDECREF(valid_out);
    return nullptr;
  }
  const float* fin = static_cast<float*>(PyArray_DATA(flow));
  const float* vin = static_cast<float*>(PyArray_DATA(valid));
  float* fout = static_cast<float*>(PyArray_DATA((PyArrayObject*)flow_out));
  int32_t* vout = static_cast<int32_t*>(PyArray_DATA((PyArrayObject*)valid_out));

  // scatter: round(coord*scale); xx/yy must be strictly inside (0, dim)
  // (augmentor.py:381-387 keeps >0 and <dim — reproduced exactly)
  for (long y = 0; y < ht; ++y) {
    for (long x = 0; x < wd; ++x) {
      const long i = y * wd + x;
      if (vin[i] < 1.0f) continue;
      const long xx = static_cast<long>(std::nearbyint(x * fx));
      const long yy = static_cast<long>(std::nearbyint(y * fy));
      if (xx <= 0 || xx >= wd1 || yy <= 0 || yy >= ht1) continue;
      const long o = yy * wd1 + xx;
      fout[2 * o] = fin[2 * i] * static_cast<float>(fx);
      fout[2 * o + 1] = fin[2 * i + 1] * static_cast<float>(fy);
      vout[o] = 1;
    }
  }
  Py_DECREF(flow);
  Py_DECREF(valid);
  return Py_BuildValue("(NN)", flow_out, valid_out);
}

// ----------------------------------------------------------------- //
// sample_queries: out[j] = values[idx[j]] (+ coords gather) in one pass
// ----------------------------------------------------------------- //

PyObject* py_sample_queries(PyObject*, PyObject* args) {
  PyArrayObject *values_o = nullptr, *coords_o = nullptr, *idx_o = nullptr;
  if (!PyArg_ParseTuple(args, "O!O!O!", &PyArray_Type, &values_o, &PyArray_Type,
                        &coords_o, &PyArray_Type, &idx_o))
    return nullptr;
  PyArrayObject* values = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)values_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)coords_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  PyArrayObject* idx = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)idx_o, NPY_INT64, NPY_ARRAY_C_CONTIGUOUS);
  if (!values || !coords || !idx) {
    Py_XDECREF(values);
    Py_XDECREF(coords);
    Py_XDECREF(idx);
    return nullptr;
  }
  if (PyArray_NDIM(values) != 1 || PyArray_NDIM(coords) != 2 ||
      PyArray_DIM(coords, 1) != 2 || PyArray_NDIM(idx) != 1 ||
      PyArray_DIM(coords, 0) != PyArray_DIM(values, 0)) {
    Py_DECREF(values);
    Py_DECREF(coords);
    Py_DECREF(idx);
    PyErr_SetString(PyExc_ValueError,
                    "values must be [N], coords [N,2], idx [Q]");
    return nullptr;
  }
  const long n = PyArray_DIM(values, 0);
  const long q = PyArray_DIM(idx, 0);
  npy_intp vshape[1] = {q};
  npy_intp cshape[2] = {q, 2};
  PyObject* v_out = PyArray_SimpleNew(1, vshape, NPY_FLOAT32);
  PyObject* c_out = PyArray_SimpleNew(2, cshape, NPY_FLOAT32);
  if (!v_out || !c_out) {
    Py_DECREF(values);
    Py_DECREF(coords);
    Py_DECREF(idx);
    Py_XDECREF(v_out);
    Py_XDECREF(c_out);
    return nullptr;
  }
  const float* vin = static_cast<float*>(PyArray_DATA(values));
  const float* cin = static_cast<float*>(PyArray_DATA(coords));
  const int64_t* iin = static_cast<int64_t*>(PyArray_DATA(idx));
  float* vout = static_cast<float*>(PyArray_DATA((PyArrayObject*)v_out));
  float* cout = static_cast<float*>(PyArray_DATA((PyArrayObject*)c_out));
  for (long j = 0; j < q; ++j) {
    const int64_t i = iin[j];
    if (i < 0 || i >= n) {
      Py_DECREF(values);
      Py_DECREF(coords);
      Py_DECREF(idx);
      Py_DECREF(v_out);
      Py_DECREF(c_out);
      PyErr_Format(PyExc_IndexError, "index %lld out of range", (long long)i);
      return nullptr;
    }
    vout[j] = vin[i];
    cout[2 * j] = cin[2 * i];
    cout[2 * j + 1] = cin[2 * i + 1];
  }
  Py_DECREF(values);
  Py_DECREF(coords);
  Py_DECREF(idx);
  return Py_BuildValue("(NN)", v_out, c_out);
}

PyMethodDef kMethods[] = {
    {"read_pfm", py_read_pfm, METH_VARARGS,
     "Decode a PFM file to a float32 ndarray (rows flipped top-down)."},
    {"scatter_resize_sparse", py_scatter_resize_sparse, METH_VARARGS,
     "Rescale a sparse flow map by scatter; returns (flow', valid')."},
    {"sample_queries", py_sample_queries, METH_VARARGS,
     "Gather (values, coords) at int64 indices in one pass."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "anystereo_native",
    "C++ data-path hot loops for anystereo_tpu", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_anystereo_native(void) {
  import_array();
  return PyModule_Create(&kModule);
}
