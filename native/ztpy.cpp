// CPython extension: zero-copy entry points into libzstdtpu_core.so.
//
// The ctypes bindings stage results in numpy arrays and convert with
// .tobytes(), costing one full output copy per call (~0.6 ms on an 8MB
// decode on this box) plus per-call marshalling.  Here the native codec
// writes directly into a PyBytes allocation, which is then resized and
// returned — zero extra copies (Decompressor.Unwrap role,
// ZstdDecompress.cs:1365, where the C# port also decodes straight into
// the caller's destination buffer).
//
// Built by zstdsharp_tpu/native.py next to libzstdtpu_core.so; loaded
// lazily with a ctypes fallback, so the package works without it.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

extern "C" {
int64_t decode_frame_body_c(const uint8_t* src, int64_t size, uint8_t* out,
                            int64_t out_cap, int64_t* consumed_out);
int64_t zt_compress_exact(const uint8_t* src, int64_t n, int level,
                          int checksum, uint8_t* out, int64_t cap);
uint64_t xxh64(const uint8_t* p, int64_t n, uint64_t seed);
}

// decode_frame_body(src, offset, cap) -> (bytes, consumed) | None
static PyObject* py_decode_frame_body(PyObject*, PyObject* args) {
    Py_buffer buf;
    Py_ssize_t offset, cap;
    if (!PyArg_ParseTuple(args, "y*nn", &buf, &offset, &cap)) return nullptr;
    if (offset < 0 || offset > buf.len || cap < 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "bad offset/cap");
        return nullptr;
    }
    PyObject* out = PyBytes_FromStringAndSize(nullptr, cap);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    int64_t consumed = 0;
    int64_t produced;
    Py_BEGIN_ALLOW_THREADS
    produced = decode_frame_body_c(
        (const uint8_t*)buf.buf + offset, (int64_t)(buf.len - offset),
        (uint8_t*)PyBytes_AS_STRING(out), (int64_t)cap, &consumed);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (produced < 0) {
        Py_DECREF(out);
        Py_RETURN_NONE;
    }
    if (produced != cap && _PyBytes_Resize(&out, (Py_ssize_t)produced) < 0)
        return nullptr;
    PyObject* res = Py_BuildValue("(NL)", out, (long long)consumed);
    return res;
}

// compress_exact(src, level, checksum) -> bytes | None
static PyObject* py_compress_exact(PyObject*, PyObject* args) {
    Py_buffer buf;
    int level, checksum;
    if (!PyArg_ParseTuple(args, "y*ip", &buf, &level, &checksum))
        return nullptr;
    const int64_t cap = (int64_t)buf.len + ((int64_t)buf.len >> 2) + 4096;
    PyObject* out = PyBytes_FromStringAndSize(nullptr, cap);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    int64_t size;
    Py_BEGIN_ALLOW_THREADS
    size = zt_compress_exact((const uint8_t*)buf.buf, (int64_t)buf.len,
                             level, checksum,
                             (uint8_t*)PyBytes_AS_STRING(out), cap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (size < 0) {
        Py_DECREF(out);
        Py_RETURN_NONE;
    }
    if (size != cap && _PyBytes_Resize(&out, (Py_ssize_t)size) < 0)
        return nullptr;
    return out;
}

// xxh64(data, seed) -> int
static PyObject* py_xxh64(PyObject*, PyObject* args) {
    Py_buffer buf;
    unsigned long long seed = 0;
    if (!PyArg_ParseTuple(args, "y*|K", &buf, &seed)) return nullptr;
    uint64_t h;
    Py_BEGIN_ALLOW_THREADS
    h = xxh64((const uint8_t*)buf.buf, (int64_t)buf.len, (uint64_t)seed);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return PyLong_FromUnsignedLongLong(h);
}

static PyMethodDef kMethods[] = {
    {"decode_frame_body", py_decode_frame_body, METH_VARARGS,
     "Decode a frame body into a fresh bytes object."},
    {"compress_exact", py_compress_exact, METH_VARARGS,
     "Byte-exact zstd frame straight into a bytes object."},
    {"xxh64", py_xxh64, METH_VARARGS, "XXH64 of a buffer."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_ztpy",
    "Zero-copy CPython bindings for zstdtpu_core", -1, kMethods,
};

PyMODINIT_FUNC PyInit__ztpy(void) { return PyModule_Create(&kModule); }
