// fpcr_io — native data-layer primitives for fpcr_tpu.
//
// TPU-native counterpart of the reference's C++ data layer: the CSV cloud
// tokenizer (readData, /root/reference/src/CUDA/GPU_point_to_point_bunny.cu:463-497)
// and the Ouster packet byte-stream reader feeding Read_data
// (/root/reference/src/CUDA/GPU_point_to_plane_real.cu:677-733). Host-side
// ingest is the one place Python is measurably slow (hundreds of thousands
// of ASCII tokens), so these hot parsers are C++; everything downstream is
// jnp/Pallas on device.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   parse_floats(path: str) -> bytes   # little-endian f32 tokens
//   parse_ints(path: str)   -> bytes   # little-endian i64 tokens
// The Python wrapper (fpcr_tpu/utils/native.py) wraps the bytes in numpy
// arrays with zero additional parsing. Separators: whitespace, ';', ','.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

char *read_whole_file(const char *path, size_t *size_out) {
  FILE *fh = std::fopen(path, "rb");
  if (!fh) return nullptr;
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(fh);
    return nullptr;
  }
  char *buf = static_cast<char *>(std::malloc(static_cast<size_t>(size) + 1));
  if (!buf) {
    std::fclose(fh);
    return nullptr;
  }
  size_t got = std::fread(buf, 1, static_cast<size_t>(size), fh);
  std::fclose(fh);
  buf[got] = '\0';
  *size_out = got;
  return buf;
}

// Replace the non-whitespace separators the reference's datasets use
// (';' in Bunny.csv, ',' defensively) so strtof/strtol can walk the buffer.
void normalize_separators(char *buf, size_t size) {
  for (size_t i = 0; i < size; ++i) {
    char c = buf[i];
    if (c == ';' || c == ',') buf[i] = ' ';
  }
}

template <typename T, typename ParseFn>
PyObject *parse_tokens(const char *path, ParseFn parse) {
  size_t size = 0;
  char *buf = read_whole_file(path, &size);
  if (!buf) {
    return PyErr_Format(PyExc_FileNotFoundError, "cannot read '%s'", path);
  }
  normalize_separators(buf, size);

  size_t cap = 1 << 16;
  size_t count = 0;
  T *vals = static_cast<T *>(std::malloc(cap * sizeof(T)));
  if (!vals) {
    std::free(buf);
    return PyErr_NoMemory();
  }

  const char *p = buf;
  const char *end = buf + size;
  while (p < end) {
    char *next = nullptr;
    T v = parse(p, &next);
    if (next == p) break;  // no further tokens
    if (count == cap) {
      cap *= 2;
      T *grown = static_cast<T *>(std::realloc(vals, cap * sizeof(T)));
      if (!grown) {
        std::free(vals);
        std::free(buf);
        return PyErr_NoMemory();
      }
      vals = grown;
    }
    vals[count++] = v;
    p = next;
  }
  std::free(buf);

  PyObject *bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(vals),
      static_cast<Py_ssize_t>(count * sizeof(T)));
  std::free(vals);
  return bytes;
}

PyObject *py_parse_floats(PyObject *, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  return parse_tokens<float>(
      path, [](const char *p, char **next) { return std::strtof(p, next); });
}

PyObject *py_parse_ints(PyObject *, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  return parse_tokens<long long>(path, [](const char *p, char **next) {
    return static_cast<long long>(std::strtoll(p, next, 10));
  });
}

PyMethodDef kMethods[] = {
    {"parse_floats", py_parse_floats, METH_VARARGS,
     "Parse all float tokens in a file -> little-endian f32 bytes."},
    {"parse_ints", py_parse_ints, METH_VARARGS,
     "Parse all integer tokens in a file -> little-endian i64 bytes."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fpcr_io",
    "Native CSV/packet tokenizers for fpcr_tpu's data layer.", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__fpcr_io(void) { return PyModule_Create(&kModule); }
