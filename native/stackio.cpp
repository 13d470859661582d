// Native data loader for microscopy TIFF stacks.
//
// The reference ecosystem feeds microTiPi from TIFF time-lapse stacks via
// Java imaging libraries (Icy); the reference repo itself ships no IO at all.
// Production TPU deconvolution is input-bound without a fast host-side
// loader, so this is a real native runtime component (not a Python wrapper):
// page decoding fans out over a thread pool (one libtiff handle per thread —
// handles are not thread-safe), converting any of u8/u16/u32/i8/i16/i32/f32
// single-sample pages to contiguous float32 volumes ready for device upload.
//
// C ABI (consumed from Python via ctypes, zero-copy into NumPy buffers):
//   mt_tiff_info(path, &nz, &ny, &nx)            -> 0 on success
//   mt_tiff_read(path, out_f32, z0, nz)          -> 0 on success (parallel)
//   mt_tiff_write(path, data_f32, nz, ny, nx)    -> 0 on success
//   mt_last_error()                              -> thread-local message
//
// Build: make -C native   (links the system libtiff)

#include <tiffio.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_err;

void set_err(const std::string& m) { g_err = m; }

// libtiff's default handlers print to stderr; silence them (errors are
// surfaced through return codes + mt_last_error).
struct SilenceTiff {
  SilenceTiff() {
    TIFFSetErrorHandler(nullptr);
    TIFFSetWarningHandler(nullptr);
  }
} g_silence;

struct PageGeom {
  uint32_t width = 0, height = 0;
  uint16_t bits = 0, fmt = SAMPLEFORMAT_UINT, spp = 1;
};

bool page_geom(TIFF* tif, PageGeom* g) {
  if (!TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &g->width) ||
      !TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &g->height)) {
    set_err("missing width/length tags");
    return false;
  }
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &g->bits);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &g->fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &g->spp);
  if (g->spp != 1) {
    set_err("only single-sample (grayscale) TIFFs are supported; got spp=" +
            std::to_string(g->spp));
    return false;
  }
  return true;
}

template <typename T>
void convert_row(const void* src, float* dst, uint32_t n) {
  const T* s = static_cast<const T*>(src);
  for (uint32_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
}

bool decode_page(TIFF* tif, float* out, const PageGeom& ref) {
  PageGeom g;
  if (!page_geom(tif, &g)) return false;
  if (g.width != ref.width || g.height != ref.height || g.bits != ref.bits ||
      g.fmt != ref.fmt) {
    set_err("page geometry mismatch within stack");
    return false;
  }
  const size_t rowbytes = TIFFScanlineSize(tif);
  std::vector<uint8_t> row(rowbytes);
  for (uint32_t y = 0; y < g.height; ++y) {
    if (TIFFReadScanline(tif, row.data(), y) < 0) {
      set_err("scanline read failed at row " + std::to_string(y));
      return false;
    }
    float* dst = out + static_cast<size_t>(y) * g.width;
    switch (g.bits) {
      case 8:
        if (g.fmt == SAMPLEFORMAT_INT) convert_row<int8_t>(row.data(), dst, g.width);
        else convert_row<uint8_t>(row.data(), dst, g.width);
        break;
      case 16:
        if (g.fmt == SAMPLEFORMAT_INT) convert_row<int16_t>(row.data(), dst, g.width);
        else convert_row<uint16_t>(row.data(), dst, g.width);
        break;
      case 32:
        if (g.fmt == SAMPLEFORMAT_IEEEFP) convert_row<float>(row.data(), dst, g.width);
        else if (g.fmt == SAMPLEFORMAT_INT) convert_row<int32_t>(row.data(), dst, g.width);
        else convert_row<uint32_t>(row.data(), dst, g.width);
        break;
      default:
        set_err("unsupported bits-per-sample: " + std::to_string(g.bits));
        return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

const char* mt_last_error() { return g_err.c_str(); }

int mt_tiff_info(const char* path, int* nz, int* ny, int* nx) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) {
    set_err(std::string("cannot open ") + path);
    return -1;
  }
  PageGeom g;
  if (!page_geom(tif, &g)) {
    TIFFClose(tif);
    return -1;
  }
  int pages = 1;
  while (TIFFReadDirectory(tif)) ++pages;
  TIFFClose(tif);
  *nz = pages;
  *ny = static_cast<int>(g.height);
  *nx = static_cast<int>(g.width);
  return 0;
}

// Decode pages [z0, z0+nz) into out (contiguous nz*ny*nx float32), fanning
// pages over a thread pool; each worker owns its own TIFF handle.
int mt_tiff_read(const char* path, float* out, int z0, int nz) {
  int tz, ty, tx;
  if (mt_tiff_info(path, &tz, &ty, &tx) != 0) return -1;
  if (z0 < 0 || nz <= 0 || z0 + nz > tz) {
    set_err("page range out of bounds");
    return -1;
  }

  // Reference geometry from page 0.
  PageGeom ref;
  {
    TIFF* tif = TIFFOpen(path, "r");
    if (!tif || !page_geom(tif, &ref)) {
      if (tif) TIFFClose(tif);
      return -1;
    }
    TIFFClose(tif);
  }

  const size_t page_px = static_cast<size_t>(ty) * tx;
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const unsigned nthreads = std::min<unsigned>(hw, static_cast<unsigned>(nz));

  std::atomic<int> next{0};
  std::atomic<bool> failed{false};
  std::vector<std::string> errs(nthreads);

  auto worker = [&](unsigned tid) {
    TIFF* tif = TIFFOpen(path, "r");
    if (!tif) {
      errs[tid] = "worker cannot reopen file";
      failed = true;
      return;
    }
    int k;
    while (!failed && (k = next.fetch_add(1)) < nz) {
      if (!TIFFSetDirectory(tif, static_cast<uint16_t>(z0 + k))) {
        errs[tid] = "cannot seek to page " + std::to_string(z0 + k);
        failed = true;
        break;
      }
      if (!decode_page(tif, out + page_px * k, ref)) {
        errs[tid] = g_err;
        failed = true;
        break;
      }
    }
    TIFFClose(tif);
  };

  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (unsigned t = 0; t < nthreads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();

  if (failed) {
    for (auto& e : errs)
      if (!e.empty()) {
        set_err(e);
        break;
      }
    return -1;
  }
  return 0;
}

int mt_tiff_write(const char* path, const float* data, int nz, int ny, int nx) {
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) {
    set_err(std::string("cannot create ") + path);
    return -1;
  }
  const size_t page_px = static_cast<size_t>(ny) * nx;
  for (int z = 0; z < nz; ++z) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, static_cast<uint32_t>(nx));
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, static_cast<uint32_t>(ny));
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 32);
    TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, SAMPLEFORMAT_IEEEFP);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 1);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, static_cast<uint32_t>(ny));
    const float* page = data + page_px * z;
    for (int y = 0; y < ny; ++y) {
      if (TIFFWriteScanline(tif, const_cast<float*>(page + static_cast<size_t>(y) * nx), y) < 0) {
        set_err("write failed at page " + std::to_string(z) + " row " + std::to_string(y));
        TIFFClose(tif);
        return -1;
      }
    }
    if (!TIFFWriteDirectory(tif)) {
      set_err("cannot finalize page " + std::to_string(z));
      TIFFClose(tif);
      return -1;
    }
  }
  TIFFClose(tif);
  return 0;
}

}  // extern "C"
