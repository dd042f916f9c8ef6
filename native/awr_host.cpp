// awr_tpu._native — host-side native runtime components.
//
// The reference's host pipeline leans on OpenCV/libpng through Python
// (reference dataloader/nyu_loader.py:71-74: depth PNG decodes as
// blue + green*256).  This module implements that IO path natively:
// a from-scratch PNG reader (zlib inflate + scanline unfiltering) that
// folds the NYU depth reconstruction into the decode loop and releases
// the GIL, so data-loading threads overlap with the host->device feed.
//
// Exposed functions (see awr_tpu/data/native_decode.py for the numpy
// wrappers):
//   decode_depth_png(path: str) -> (bytes_f32, (h, w))
//   decode_depth_pngs(paths: sequence[str]) -> (bytes_f32, (n, h, w))
//
// Scope: 8-bit, non-interlaced, color type 2 (RGB) or 6 (RGBA) PNGs —
// the format cv2.imwrite produces and the NYU depth dumps use.  Anything
// else raises ValueError rather than guessing.

#include <Python.h>

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PngImage {
  uint32_t width = 0;
  uint32_t height = 0;
  int channels = 0;
  std::vector<float> depth;  // width*height, b + 256*g
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool read_file(const char* path, std::vector<uint8_t>* out,
               std::string* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    *err = std::string("cannot open ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) {
    std::fclose(f);
    *err = std::string("cannot stat ") + path;
    return false;
  }
  out->resize(size_t(n));
  size_t got = n ? std::fread(out->data(), 1, size_t(n), f) : 0;
  std::fclose(f);
  if (got != size_t(n)) {
    *err = std::string("short read on ") + path;
    return false;
  }
  return true;
}

// Which PNG encodings a caller accepts.  Datasets have different cv2
// spellings (NYU: imread + b+256g fold of 8-bit RGB; ICVL/HANDS17:
// IMREAD_ANYDEPTH 16-bit gray), so a caller must be able to insist on
// the matching on-disk format instead of letting the auto-dispatch
// silently decode a mismatched file differently than its cv2 fallback
// would.
enum ExpectKind { kAny = 0, kNyuRgb8 = 1, kGray16 = 2 };

bool parse_kind(const char* s, ExpectKind* out, std::string* err) {
  if (!s || std::strcmp(s, "any") == 0) {
    *out = kAny;
  } else if (std::strcmp(s, "nyu") == 0) {
    *out = kNyuRgb8;
  } else if (std::strcmp(s, "gray16") == 0) {
    *out = kGray16;
  } else {
    *err = std::string("unknown kind '") + s +
           "'; expected 'any', 'nyu', or 'gray16'";
    return false;
  }
  return true;
}

// Decode one PNG file into the NYU depth convention.  Runs without the
// GIL; returns false + err message on any malformed/unsupported input.
bool decode_png_depth(const char* path, PngImage* img, std::string* err,
                      ExpectKind expect = kAny) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf, err)) return false;

  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                  0x1a, '\n'};
  if (buf.size() < 8 || std::memcmp(buf.data(), kSig, 8) != 0) {
    *err = std::string(path) + ": not a PNG (bad signature)";
    return false;
  }

  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = -1;
  std::vector<uint8_t> idat;

  size_t pos = 8;
  bool saw_iend = false;
  while (pos + 12 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + size_t(len) > buf.size()) {
      *err = std::string(path) + ": truncated chunk";
      return false;
    }
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len != 13) {
        *err = std::string(path) + ": bad IHDR";
        return false;
      }
      width = be32(data);
      height = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      saw_iend = true;
      break;
    }
    pos += 12 + size_t(len);
  }
  if (!saw_iend || width == 0 || height == 0) {
    *err = std::string(path) + ": missing IHDR/IEND";
    return false;
  }
  // Supported encodings:
  //   8-bit RGB/RGBA       -> depth = blue + 256*green   (NYU,
  //                           reference nyu_loader.py:71-74)
  //   16-bit grayscale     -> depth = u16 value          (ICVL/HANDS17
  //                           style cv2 IMREAD_ANYDEPTH frames)
  const bool rgb8 =
      bit_depth == 8 && (color_type == 2 || color_type == 6);
  const bool gray16 = bit_depth == 16 && color_type == 0;
  if ((expect == kNyuRgb8 && !rgb8) || (expect == kGray16 && !gray16)) {
    char msg[192];
    std::snprintf(msg, sizeof(msg),
                  "%s: PNG (bit_depth=%d color_type=%d) does not match "
                  "the caller's expected encoding (%s); refusing to "
                  "decode with mismatched semantics",
                  path, bit_depth, color_type,
                  expect == kNyuRgb8 ? "8-bit RGB/RGBA, NYU b+256g"
                                     : "16-bit grayscale");
    *err = msg;
    return false;
  }
  if ((!rgb8 && !gray16) || interlace != 0) {
    char msg[192];
    std::snprintf(msg, sizeof(msg),
                  "%s: unsupported PNG (bit_depth=%d color_type=%d "
                  "interlace=%d); need 8-bit RGB/RGBA or 16-bit gray, "
                  "non-interlaced",
                  path, bit_depth, color_type, interlace);
    *err = msg;
    return false;
  }
  // bytes per pixel: filter reconstruction operates on whole pixels
  const int ch = gray16 ? 2 : (color_type == 2 ? 3 : 4);
  const size_t stride = size_t(width) * ch;
  const size_t raw_size = (stride + 1) * height;

  std::vector<uint8_t> raw(raw_size);
  {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) {
      *err = "zlib init failed";
      return false;
    }
    zs.next_in = idat.data();
    zs.avail_in = uInt(idat.size());
    zs.next_out = raw.data();
    zs.avail_out = uInt(raw.size());
    int rc = inflate(&zs, Z_FINISH);
    uLong produced = zs.total_out;
    inflateEnd(&zs);
    if ((rc != Z_STREAM_END && rc != Z_OK) || produced != raw_size) {
      char msg[128];
      std::snprintf(msg, sizeof(msg),
                    "%s: inflate failed (rc=%d, got %lu want %zu)", path,
                    rc, produced, raw_size);
      *err = msg;
      return false;
    }
  }

  // Unfilter scanlines in place (PNG filters 0-4), then fold the NYU
  // depth reconstruction: depth = blue + 256 * green (RGB order in the
  // PNG stream; the reference indexes cv2's BGR as [:, :, 0] + 256 *
  // [:, :, 1], the same two samples).
  img->width = width;
  img->height = height;
  img->channels = ch;
  img->depth.resize(size_t(width) * height);

  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* line = &raw[(stride + 1) * y];
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i) {
          uint8_t left = i >= size_t(ch) ? cur[i - ch] : 0;
          cur[i] = uint8_t(src[i] + left);
        }
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i)
          cur[i] = uint8_t(src[i] + prev[i]);
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(ch) ? cur[i - ch] : 0;
          cur[i] = uint8_t(src[i] + ((left + prev[i]) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(ch) ? cur[i - ch] : 0;
          int upleft = i >= size_t(ch) ? prev[i - ch] : 0;
          cur[i] = uint8_t(src[i] + paeth(left, prev[i], upleft));
        }
        break;
      default: {
        char msg[96];
        std::snprintf(msg, sizeof(msg), "%s: bad filter byte %d on row %u",
                      path, filter, y);
        *err = msg;
        return false;
      }
    }
    float* drow = &img->depth[size_t(y) * width];
    if (gray16) {
      for (uint32_t x = 0; x < width; ++x) {
        const uint8_t* px = &cur[size_t(x) * 2];  // big-endian u16
        drow[x] = float((uint32_t(px[0]) << 8) | px[1]);
      }
    } else {
      for (uint32_t x = 0; x < width; ++x) {
        const uint8_t* px = &cur[size_t(x) * ch];  // R, G, B[, A]
        drow[x] = float(px[2]) + 256.0f * float(px[1]);
      }
    }
    std::swap(prev, cur);
  }
  return true;
}

PyObject* py_decode_depth_png(PyObject*, PyObject* args) {
  const char* path = nullptr;
  const char* kind = nullptr;
  if (!PyArg_ParseTuple(args, "s|s", &path, &kind)) return nullptr;
  ExpectKind expect;
  std::string err;
  if (!parse_kind(kind, &expect, &err)) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }

  PngImage img;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = decode_png_depth(path, &img, &err, expect);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(img.depth.data()),
      Py_ssize_t(img.depth.size() * sizeof(float)));
  if (!bytes) return nullptr;
  return Py_BuildValue("N(II)", bytes, img.height, img.width);
}

PyObject* py_decode_depth_pngs(PyObject*, PyObject* args) {
  PyObject* seq_obj = nullptr;
  const char* kind = nullptr;
  if (!PyArg_ParseTuple(args, "O|s", &seq_obj, &kind)) return nullptr;
  ExpectKind expect;
  std::string kind_err;
  if (!parse_kind(kind, &expect, &kind_err)) {
    PyErr_SetString(PyExc_ValueError, kind_err.c_str());
    return nullptr;
  }
  PyObject* seq = PySequence_Fast(seq_obj, "expected a sequence of paths");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);

  std::vector<std::string> paths;
  paths.reserve(size_t(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) {
      Py_DECREF(seq);
      return nullptr;
    }
    paths.emplace_back(s);
  }
  Py_DECREF(seq);

  std::vector<float> out;
  uint32_t h = 0, w = 0;
  std::string err;
  bool ok = true;
  Py_BEGIN_ALLOW_THREADS;
  for (size_t i = 0; i < paths.size() && ok; ++i) {
    PngImage img;
    ok = decode_png_depth(paths[i].c_str(), &img, &err, expect);
    if (!ok) break;
    if (i == 0) {
      h = img.height;
      w = img.width;
      out.reserve(paths.size() * img.depth.size());
    } else if (img.height != h || img.width != w) {
      char msg[160];
      std::snprintf(msg, sizeof(msg),
                    "%s: size %ux%u differs from first frame %ux%u",
                    paths[i].c_str(), img.width, img.height, w, h);
      err = msg;
      ok = false;
      break;
    }
    out.insert(out.end(), img.depth.begin(), img.depth.end());
  }
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      Py_ssize_t(out.size() * sizeof(float)));
  if (!bytes) return nullptr;
  return Py_BuildValue("N(nII)", bytes, n, h, w);
}

PyMethodDef kMethods[] = {
    {"decode_depth_png", py_decode_depth_png, METH_VARARGS,
     "decode_depth_png(path, kind='any') -> (float32 bytes, (h, w)): "
     "depth PNG decode.  8-bit RGB/RGBA folds blue + 256*green "
     "(reference nyu_loader.py:71-74); 16-bit gray reads values "
     "directly.  kind in {'any','nyu','gray16'} restricts the accepted "
     "on-disk encoding (ValueError on mismatch)."},
    {"decode_depth_pngs", py_decode_depth_pngs, METH_VARARGS,
     "decode_depth_pngs(paths, kind='any') -> (float32 bytes, "
     "(n, h, w)): batched decode; all frames must share one size."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native host runtime for awr_tpu (PNG depth IO).", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&kModule); }
