// Native NIfTI-1/2 volume reader (C extension).
//
// The reference vendors ~11k lines of layNii/znzlib/zlib C++ purely to load
// .nii/.nii.gz volumes as float32 (readNiiFile, Src/Util/readNii.cpp;
// SURVEY.md §2.11/2.18/2.20). This is the TPU framework's native equivalent:
// a from-scratch CPython extension that parses NIfTI-1 (348-byte header) and
// NIfTI-2 (540-byte header), both endiannesses, inflates .nii.gz with zlib,
// converts any supported datatype to float32 (applying scl_slope/scl_inter
// like copy_nifti_as_float32), and hands the pixels to NumPy as a
// (nz, ny, nx) C-order array with zero extra copies beyond the decode.
//
// Python-side wrapper with fallback: sift3d_tpu/io/native.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Header {
  int64_t nx = 1, ny = 1, nz = 1;
  int16_t datatype = 0;
  int64_t vox_offset = 0;
  double scl_slope = 0.0, scl_inter = 0.0;
  bool swap = false;  // byte-swapped file
};

template <typename T>
T bswap(T v) {
  T out;
  auto *src = reinterpret_cast<unsigned char *>(&v);
  auto *dst = reinterpret_cast<unsigned char *>(&out);
  for (size_t i = 0; i < sizeof(T); ++i) dst[i] = src[sizeof(T) - 1 - i];
  return out;
}

template <typename T>
T get(const unsigned char *p, bool swap) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return swap ? bswap(v) : v;
}

bool gunzip(const std::vector<unsigned char> &in,
            std::vector<unsigned char> *out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // gzip or zlib
  out->resize(in.size() * 4 + (1 << 20));
  zs.next_in = const_cast<unsigned char *>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  size_t written = 0;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    if (written == out->size()) out->resize(out->size() * 2);
    zs.next_out = out->data() + written;
    zs.avail_out = static_cast<uInt>(out->size() - written);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    written = out->size() - zs.avail_out;
  }
  out->resize(written);
  inflateEnd(&zs);
  return true;
}

bool parse_header(const unsigned char *p, size_t n, Header *h,
                  std::string *err) {
  if (n < 348) {
    *err = "file too short for a NIfTI header";
    return false;
  }
  int32_t sz = get<int32_t>(p, false);
  bool swap = false;
  if (sz != 348 && sz != 540) {
    sz = get<int32_t>(p, true);
    swap = true;
  }
  h->swap = swap;
  if (sz == 348) {  // NIfTI-1
    if (std::memcmp(p + 344, "n+1", 3) != 0 &&
        std::memcmp(p + 344, "ni1", 3) != 0) {
      *err = "bad NIfTI-1 magic";
      return false;
    }
    int16_t ndim = get<int16_t>(p + 40, swap);
    if (ndim < 1 || ndim > 7) {
      *err = "bad dim[0]";
      return false;
    }
    int16_t d[7] = {1, 1, 1, 1, 1, 1, 1};
    for (int i = 0; i < ndim; ++i) d[i] = get<int16_t>(p + 42 + 2 * i, swap);
    for (int i = 3; i < ndim; ++i)
      if (d[i] != 1) {
        *err = "only 3-D volumes supported";
        return false;
      }
    h->nx = d[0];
    h->ny = ndim > 1 ? d[1] : 1;
    h->nz = ndim > 2 ? d[2] : 1;
    h->datatype = get<int16_t>(p + 70, swap);
    h->vox_offset = static_cast<int64_t>(get<float>(p + 108, swap));
    h->scl_slope = get<float>(p + 112, swap);
    h->scl_inter = get<float>(p + 116, swap);
  } else if (sz == 540) {  // NIfTI-2
    if (std::memcmp(p + 4, "n+2", 3) != 0 &&
        std::memcmp(p + 4, "ni2", 3) != 0) {
      *err = "bad NIfTI-2 magic";
      return false;
    }
    h->datatype = get<int16_t>(p + 12, swap);
    int64_t ndim = get<int64_t>(p + 16, swap);
    if (ndim < 1 || ndim > 7) {
      *err = "bad dim[0]";
      return false;
    }
    int64_t d[7] = {1, 1, 1, 1, 1, 1, 1};
    for (int i = 0; i < ndim; ++i) d[i] = get<int64_t>(p + 24 + 8 * i, swap);
    for (int i = 3; i < ndim; ++i)
      if (d[i] != 1) {
        *err = "only 3-D volumes supported";
        return false;
      }
    h->nx = d[0];
    h->ny = ndim > 1 ? d[1] : 1;
    h->nz = ndim > 2 ? d[2] : 1;
    h->vox_offset = get<int64_t>(p + 168, swap);
    h->scl_slope = get<double>(p + 176, swap);
    h->scl_inter = get<double>(p + 184, swap);
  } else {
    *err = "not a NIfTI file";
    return false;
  }
  return true;
}

template <typename T>
void convert(const unsigned char *src, float *dst, int64_t count, bool swap,
             float slope, float inter, bool scale) {
  for (int64_t i = 0; i < count; ++i) {
    T v = get<T>(src + i * sizeof(T), swap);
    float f = static_cast<float>(v);
    dst[i] = scale ? f * slope + inter : f;
  }
}

// read_nii(path) -> (buffer_bytes(float32), nx, ny, nz)
PyObject *read_nii(PyObject * /*self*/, PyObject *args) {
  const char *path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  std::vector<unsigned char> raw;
  {
    FILE *f = fopen(path, "rb");
    if (!f) {
      PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
      return nullptr;
    }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    raw.resize(static_cast<size_t>(sz));
    size_t rd = fread(raw.data(), 1, raw.size(), f);
    fclose(f);
    if (rd != raw.size()) {
      PyErr_Format(PyExc_IOError, "short read on %s", path);
      return nullptr;
    }
  }

  std::vector<unsigned char> inflated;
  const std::vector<unsigned char> *data = &raw;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = gunzip(raw, &inflated);
    Py_END_ALLOW_THREADS
    if (!ok) {
      PyErr_Format(PyExc_ValueError, "gzip decode failed for %s", path);
      return nullptr;
    }
    data = &inflated;
  }

  Header h;
  std::string err;
  if (!parse_header(data->data(), data->size(), &h, &err)) {
    PyErr_Format(PyExc_ValueError, "%s: %s", path, err.c_str());
    return nullptr;
  }

  int64_t count = h.nx * h.ny * h.nz;
  int itemsize;
  switch (h.datatype) {
    case 2: case 256: itemsize = 1; break;            // u8 / i8
    case 4: case 512: itemsize = 2; break;            // i16 / u16
    case 8: case 768: case 16: itemsize = 4; break;   // i32 / u32 / f32
    case 64: case 1024: case 1280: itemsize = 8; break;  // f64 / i64 / u64
    default:
      PyErr_Format(PyExc_ValueError, "unsupported NIfTI datatype %d",
                   h.datatype);
      return nullptr;
  }
  if (h.vox_offset < 0 ||
      static_cast<int64_t>(data->size()) <
          h.vox_offset + count * static_cast<int64_t>(itemsize)) {
    PyErr_Format(PyExc_ValueError, "truncated NIfTI payload in %s", path);
    return nullptr;
  }

  PyObject *bytes = PyBytes_FromStringAndSize(nullptr, count * sizeof(float));
  if (!bytes) return nullptr;
  float *dst = reinterpret_cast<float *>(PyBytes_AsString(bytes));
  const unsigned char *src = data->data() + h.vox_offset;

  float slope = static_cast<float>(h.scl_slope);
  float inter = static_cast<float>(h.scl_inter);
  bool scale = !(slope == 0.0f || (slope == 1.0f && inter == 0.0f));

  Py_BEGIN_ALLOW_THREADS
  switch (h.datatype) {
    case 2: convert<uint8_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 256: convert<int8_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 4: convert<int16_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 512: convert<uint16_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 8: convert<int32_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 768: convert<uint32_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 16: convert<float>(src, dst, count, h.swap, slope, inter, scale); break;
    case 64: convert<double>(src, dst, count, h.swap, slope, inter, scale); break;
    case 1024: convert<int64_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 1280: convert<uint64_t>(src, dst, count, h.swap, slope, inter, scale); break;
  }
  Py_END_ALLOW_THREADS

  PyObject *out = Py_BuildValue("(NLLL)", bytes, (long long)h.nx,
                                (long long)h.ny, (long long)h.nz);
  return out;
}

// Decode one file into a malloc'd float buffer (no Python API; thread-safe).
bool decode_file(const std::string &path, std::vector<float> *out,
                 int64_t *nx, int64_t *ny, int64_t *nz, std::string *err) {
  std::vector<unsigned char> raw;
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  raw.resize(static_cast<size_t>(sz));
  size_t rd = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  if (rd != raw.size()) {
    *err = "short read " + path;
    return false;
  }
  std::vector<unsigned char> inflated;
  const std::vector<unsigned char> *data = &raw;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    if (!gunzip(raw, &inflated)) {
      *err = "gzip decode failed " + path;
      return false;
    }
    data = &inflated;
  }
  Header h;
  if (!parse_header(data->data(), data->size(), &h, err)) return false;
  int64_t count = h.nx * h.ny * h.nz;
  int itemsize;
  switch (h.datatype) {
    case 2: case 256: itemsize = 1; break;
    case 4: case 512: itemsize = 2; break;
    case 8: case 768: case 16: itemsize = 4; break;
    case 64: case 1024: case 1280: itemsize = 8; break;
    default: *err = "unsupported datatype"; return false;
  }
  if (h.vox_offset < 0 ||
      static_cast<int64_t>(data->size()) <
          h.vox_offset + count * static_cast<int64_t>(itemsize)) {
    *err = "truncated payload " + path;
    return false;
  }
  out->resize(static_cast<size_t>(count));
  const unsigned char *src = data->data() + h.vox_offset;
  float slope = static_cast<float>(h.scl_slope);
  float inter = static_cast<float>(h.scl_inter);
  bool scale = !(slope == 0.0f || (slope == 1.0f && inter == 0.0f));
  float *dst = out->data();
  switch (h.datatype) {
    case 2: convert<uint8_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 256: convert<int8_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 4: convert<int16_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 512: convert<uint16_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 8: convert<int32_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 768: convert<uint32_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 16: convert<float>(src, dst, count, h.swap, slope, inter, scale); break;
    case 64: convert<double>(src, dst, count, h.swap, slope, inter, scale); break;
    case 1024: convert<int64_t>(src, dst, count, h.swap, slope, inter, scale); break;
    case 1280: convert<uint64_t>(src, dst, count, h.swap, slope, inter, scale); break;
  }
  *nx = h.nx;
  *ny = h.ny;
  *nz = h.nz;
  return true;
}

// read_nii_batch(paths, nthreads) -> list[(float32_bytes, nx, ny, nz)]
// Parallel gz-inflate + dtype-convert across a thread pool (GIL released).
PyObject *read_nii_batch(PyObject * /*self*/, PyObject *args) {
  PyObject *paths_obj = nullptr;
  int nthreads = 4;
  if (!PyArg_ParseTuple(args, "O|i", &paths_obj, &nthreads)) return nullptr;
  PyObject *seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<std::string> paths;
  paths.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject *item = PySequence_Fast_GET_ITEM(seq, i);
    const char *s = PyUnicode_AsUTF8(item);
    if (!s) {
      Py_DECREF(seq);
      return nullptr;
    }
    paths.emplace_back(s);
  }
  Py_DECREF(seq);

  struct Result {
    std::vector<float> data;
    int64_t nx = 0, ny = 0, nz = 0;
    bool ok = false;
    std::string err;
  };
  std::vector<Result> results(paths.size());
  if (nthreads < 1) nthreads = 1;

  Py_BEGIN_ALLOW_THREADS {
    std::atomic<size_t> next(0);
    auto worker = [&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= paths.size()) break;
        Result &r = results[i];
        r.ok = decode_file(paths[i], &r.data, &r.nx, &r.ny, &r.nz, &r.err);
      }
    };
    std::vector<std::thread> pool;
    int tcount = std::min<int>(nthreads, static_cast<int>(paths.size()));
    for (int t = 0; t < tcount; ++t) pool.emplace_back(worker);
    for (auto &th : pool) th.join();
  }
  Py_END_ALLOW_THREADS

  PyObject *out = PyList_New(static_cast<Py_ssize_t>(results.size()));
  if (!out) return nullptr;
  for (size_t i = 0; i < results.size(); ++i) {
    Result &r = results[i];
    if (!r.ok) {
      Py_DECREF(out);
      PyErr_SetString(PyExc_ValueError, r.err.c_str());
      return nullptr;
    }
    PyObject *bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char *>(r.data.data()),
        static_cast<Py_ssize_t>(r.data.size() * sizeof(float)));
    if (!bytes) {
      Py_DECREF(out);
      return nullptr;
    }
    PyObject *tup = Py_BuildValue("(NLLL)", bytes, (long long)r.nx,
                                  (long long)r.ny, (long long)r.nz);
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i), tup);
  }
  return out;
}

PyMethodDef methods[] = {
    {"read_nii", read_nii, METH_VARARGS,
     "read_nii(path) -> (float32_bytes, nx, ny, nz)"},
    {"read_nii_batch", read_nii_batch, METH_VARARGS,
     "read_nii_batch(paths, nthreads=4) -> list[(float32_bytes, nx, ny, nz)]"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_nifti_native", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__nifti_native(void) {
  return PyModule_Create(&moduledef);
}
