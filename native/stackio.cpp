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
//   mt_tiff_read(path, out_f32, z0, nz)          -> 0 on success (parallel;
//                                                   strip or tile layout,
//                                                   any libtiff codec)
//   mt_tiff_write(path, data_f32, nz, ny, nx)    -> 0 on success
//   mt_tiff_write_opts(path, data, nz, ny, nx, compression, tile, dxy, dz,
//                      description)             -> compression "none"/"lzw"/
//                                                   "deflate", tile 0=strips,
//                                                   dxy/dz [m] stamped as
//                                                   resolution + ImageJ desc;
//                                                   description overrides the
//                                                   auto desc (e.g. OME-XML)
//   mt_tiff_pixel_size(path, &dxy_m, &dz_m)      -> 0 on success; 0.0 where
//                                                   unknown. Sources, in
//                                                   priority order: OME-XML
//                                                   PhysicalSize{X,Z}(Unit),
//                                                   ImageJ desc (spacing/
//                                                   unit + XResolution),
//                                                   plain XResolution tag
//   mt_tiff_description(path, buf, cap)          -> length of the first
//                                                   page's ImageDescription
//                                                   (0 if absent, -1 on
//                                                   error); copies up to
//                                                   cap-1 bytes + NUL so the
//                                                   OME-XML block is
//                                                   retrievable from Python
//   mt_last_error()                              -> thread-local message
//
// Build: make -C native   (links the system libtiff)

#include <tiffio.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
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

bool convert_block(const void* src, float* dst, uint32_t n, uint16_t bits, uint16_t fmt) {
  switch (bits) {
    case 8:
      if (fmt == SAMPLEFORMAT_INT) convert_row<int8_t>(src, dst, n);
      else convert_row<uint8_t>(src, dst, n);
      return true;
    case 16:
      if (fmt == SAMPLEFORMAT_INT) convert_row<int16_t>(src, dst, n);
      else convert_row<uint16_t>(src, dst, n);
      return true;
    case 32:
      if (fmt == SAMPLEFORMAT_IEEEFP) convert_row<float>(src, dst, n);
      else if (fmt == SAMPLEFORMAT_INT) convert_row<int32_t>(src, dst, n);
      else convert_row<uint32_t>(src, dst, n);
      return true;
    default:
      set_err("unsupported bits-per-sample: " + std::to_string(bits));
      return false;
  }
}

// Decode one tiled page: tiles stream through TIFFReadTile (libtiff handles
// any codec), edge tiles are cropped into the destination.
bool decode_page_tiled(TIFF* tif, float* out, const PageGeom& g) {
  uint32_t tw = 0, th = 0;
  if (!TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw) ||
      !TIFFGetField(tif, TIFFTAG_TILELENGTH, &th) || tw == 0 || th == 0) {
    set_err("tiled page missing tile dimensions");
    return false;
  }
  const size_t bytes_px = g.bits / 8;
  std::vector<uint8_t> tile(TIFFTileSize(tif));
  for (uint32_t y0 = 0; y0 < g.height; y0 += th) {
    for (uint32_t x0 = 0; x0 < g.width; x0 += tw) {
      if (TIFFReadTile(tif, tile.data(), x0, y0, 0, 0) < 0) {
        set_err("tile read failed at (" + std::to_string(x0) + "," + std::to_string(y0) + ")");
        return false;
      }
      const uint32_t hcopy = std::min(th, g.height - y0);
      const uint32_t wcopy = std::min(tw, g.width - x0);
      for (uint32_t r = 0; r < hcopy; ++r) {
        const uint8_t* srow = tile.data() + static_cast<size_t>(r) * tw * bytes_px;
        float* drow = out + static_cast<size_t>(y0 + r) * g.width + x0;
        if (!convert_block(srow, drow, wcopy, g.bits, g.fmt)) return false;
      }
    }
  }
  return true;
}

bool decode_page(TIFF* tif, float* out, const PageGeom& ref) {
  PageGeom g;
  if (!page_geom(tif, &g)) return false;
  if (g.width != ref.width || g.height != ref.height || g.bits != ref.bits ||
      g.fmt != ref.fmt) {
    set_err("page geometry mismatch within stack");
    return false;
  }
  if (TIFFIsTiled(tif)) return decode_page_tiled(tif, out, g);
  const size_t rowbytes = TIFFScanlineSize(tif);
  std::vector<uint8_t> row(rowbytes);
  for (uint32_t y = 0; y < g.height; ++y) {
    if (TIFFReadScanline(tif, row.data(), y) < 0) {
      set_err("scanline read failed at row " + std::to_string(y));
      return false;
    }
    if (!convert_block(row.data(), out + static_cast<size_t>(y) * g.width, g.width,
                       g.bits, g.fmt))
      return false;
  }
  return true;
}

// ---- pixel-size metadata ---------------------------------------------------

// Value of attr="..." (OME-XML style) or attr=value (ImageJ style) in desc.
bool find_kv(const std::string& d, const std::string& key, std::string* val) {
  size_t pos = d.find(key + "=");
  if (pos == std::string::npos) return false;
  pos += key.size() + 1;
  if (pos >= d.size()) return false;
  if (d[pos] == '"') {
    size_t end = d.find('"', pos + 1);
    if (end == std::string::npos) return false;
    *val = d.substr(pos + 1, end - pos - 1);
  } else {
    size_t end = d.find_first_of("\n\r ", pos);
    *val = d.substr(pos, end == std::string::npos ? std::string::npos : end - pos);
  }
  return true;
}

// Length-unit name -> meters (OME defaults to micrometers; "\xc2\xb5m" is
// UTF-8 for the micro sign).
double unit_to_m(const std::string& u) {
  if (u.empty() || u == "\xc2\xb5m" || u == "um" || u == "micron" || u == "microns" ||
      u == "micrometer")
    return 1e-6;
  if (u == "nm") return 1e-9;
  if (u == "mm") return 1e-3;
  if (u == "cm") return 1e-2;
  if (u == "m") return 1.0;
  if (u == "\xc3\x85" || u == "angstrom") return 1e-10;
  return 0.0;  // unknown unit: treat as absent
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

// Pixel sizes in meters; 0.0 where unknown. Priority: OME-XML PhysicalSize*
// attributes, ImageJ description (spacing/unit + XResolution), bare
// XResolution + ResolutionUnit.
int mt_tiff_pixel_size(const char* path, double* dxy_m, double* dz_m) {
  *dxy_m = 0.0;
  *dz_m = 0.0;
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) {
    set_err(std::string("cannot open ") + path);
    return -1;
  }
  std::string desc;
  {
    char* raw = nullptr;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &raw) && raw) desc = raw;
  }
  std::string v, u;

  // OME-XML (OME-TIFF stores the XML in the first page's description).
  if (desc.find("PhysicalSizeX") != std::string::npos) {
    double scale = 1e-6;  // OME default unit is micrometer
    if (find_kv(desc, "PhysicalSizeXUnit", &u)) {
      double s = unit_to_m(u);
      if (s > 0) scale = s;
    }
    if (find_kv(desc, "PhysicalSizeX", &v)) *dxy_m = atof(v.c_str()) * scale;
    double zscale = 1e-6;
    if (find_kv(desc, "PhysicalSizeZUnit", &u)) {
      double s = unit_to_m(u);
      if (s > 0) zscale = s;
    }
    if (find_kv(desc, "PhysicalSizeZ", &v)) *dz_m = atof(v.c_str()) * zscale;
  } else if (desc.find("ImageJ=") != std::string::npos) {
    // ImageJ convention: "spacing" is the z step in "unit"; the lateral size
    // is XResolution in pixels-per-"unit".
    double scale = 1e-6;
    if (find_kv(desc, "unit", &u)) {
      double s = unit_to_m(u);
      if (s > 0) scale = s;
    }
    if (find_kv(desc, "spacing", &v)) *dz_m = atof(v.c_str()) * scale;
    float xres = 0.0f;
    if (TIFFGetField(tif, TIFFTAG_XRESOLUTION, &xres) && xres > 0)
      *dxy_m = scale / xres;
  }

  // Plain baseline-TIFF resolution as a fallback for dxy.
  if (*dxy_m == 0.0) {
    float xres = 0.0f;
    uint16_t unit = RESUNIT_INCH;
    if (TIFFGetField(tif, TIFFTAG_XRESOLUTION, &xres) && xres > 0) {
      TIFFGetFieldDefaulted(tif, TIFFTAG_RESOLUTIONUNIT, &unit);
      if (unit == RESUNIT_CENTIMETER) *dxy_m = 0.01 / xres;
      else if (unit == RESUNIT_INCH) *dxy_m = 0.0254 / xres;
      // RESUNIT_NONE: dimensionless, leave 0
    }
  }
  TIFFClose(tif);
  return 0;
}

// First-page ImageDescription (where OME-TIFF keeps its XML). Returns the
// full description length (0 = absent) and copies min(len, cap-1) bytes +
// NUL into buf; callers retry with a larger buffer when len >= cap.
int mt_tiff_description(const char* path, char* buf, int cap) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) {
    set_err(std::string("cannot open ") + path);
    return -1;
  }
  char* raw = nullptr;
  std::string desc;
  if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &raw) && raw) desc = raw;
  TIFFClose(tif);
  if (buf && cap > 0) {
    const size_t n = std::min(desc.size(), static_cast<size_t>(cap - 1));
    std::memcpy(buf, desc.data(), n);
    buf[n] = '\0';
  }
  return static_cast<int>(desc.size());
}

// Options writer: compression "none"/"lzw"/"deflate"; tile 0 = strip layout,
// else square tile edge (multiple of 16 per the TIFF spec); dxy/dz in meters
// (0 = omit) stamped as XResolution (px/cm) + an ImageJ-style description so
// mt_tiff_pixel_size and the ecosystem's readers round-trip the geometry.
int mt_tiff_write_opts(const char* path, const float* data, int nz, int ny, int nx,
                       const char* compression, int tile, double dxy_m, double dz_m,
                       const char* description, int bigtiff) {
  uint16_t comp = COMPRESSION_NONE;
  if (compression && std::string(compression) == "lzw") comp = COMPRESSION_LZW;
  else if (compression && std::string(compression) == "deflate") comp = COMPRESSION_ADOBE_DEFLATE;
  else if (compression && std::string(compression) != "none" && std::string(compression)[0]) {
    set_err(std::string("unknown compression: ") + compression);
    return -1;
  }
  if (tile && (tile % 16 || tile < 16)) {
    set_err("tile size must be a positive multiple of 16");
    return -1;
  }

  // BigTIFF (64-bit offsets) on request or automatically when the payload
  // approaches the classic 4 GiB limit; libtiff reads both transparently.
  const size_t total_bytes = static_cast<size_t>(nz) * ny * nx * sizeof(float);
  const bool big = bigtiff || total_bytes > (size_t{1} << 31);
  TIFF* tif = TIFFOpen(path, big ? "w8" : "w");
  if (!tif) {
    set_err(std::string("cannot create ") + path);
    return -1;
  }
  std::string desc;
  if (description && description[0]) {
    desc = description;  // caller-supplied (e.g. OME-XML)
  } else if (dz_m > 0 || dxy_m > 0) {
    char buf[160];
    snprintf(buf, sizeof(buf), "ImageJ=1.54\nimages=%d\nslices=%d\nspacing=%.9g\nunit=micron\nloop=false\n",
             nz, nz, dz_m > 0 ? dz_m * 1e6 : 0.0);
    desc = buf;
  }
  const size_t page_px = static_cast<size_t>(ny) * nx;
  std::vector<float> tbuf;
  for (int z = 0; z < nz; ++z) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, static_cast<uint32_t>(nx));
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, static_cast<uint32_t>(ny));
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 32);
    TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, SAMPLEFORMAT_IEEEFP);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 1);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_MINISBLACK);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, comp);
    if (z == 0 && !desc.empty())
      TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, desc.c_str());
    if (dxy_m > 0) {
      const bool imagej_desc = !desc.empty() && (!description || !description[0]);
      if (imagej_desc) {
        // ImageJ convention: XResolution is pixels per *desc unit* (micron)
        // with ResolutionUnit NONE.
        const float ppum = static_cast<float>(1e-6 / dxy_m);
        TIFFSetField(tif, TIFFTAG_RESOLUTIONUNIT, RESUNIT_NONE);
        TIFFSetField(tif, TIFFTAG_XRESOLUTION, ppum);
        TIFFSetField(tif, TIFFTAG_YRESOLUTION, ppum);
      } else {
        const float ppcm = static_cast<float>(0.01 / dxy_m);  // pixels per cm
        TIFFSetField(tif, TIFFTAG_RESOLUTIONUNIT, RESUNIT_CENTIMETER);
        TIFFSetField(tif, TIFFTAG_XRESOLUTION, ppcm);
        TIFFSetField(tif, TIFFTAG_YRESOLUTION, ppcm);
      }
    }
    const float* page = data + page_px * z;
    if (tile) {
      TIFFSetField(tif, TIFFTAG_TILEWIDTH, static_cast<uint32_t>(tile));
      TIFFSetField(tif, TIFFTAG_TILELENGTH, static_cast<uint32_t>(tile));
      tbuf.assign(static_cast<size_t>(tile) * tile, 0.0f);
      for (int y0 = 0; y0 < ny; y0 += tile) {
        for (int x0 = 0; x0 < nx; x0 += tile) {
          const int hcopy = std::min(tile, ny - y0);
          const int wcopy = std::min(tile, nx - x0);
          std::fill(tbuf.begin(), tbuf.end(), 0.0f);
          for (int r = 0; r < hcopy; ++r)
            std::memcpy(tbuf.data() + static_cast<size_t>(r) * tile,
                        page + static_cast<size_t>(y0 + r) * nx + x0,
                        static_cast<size_t>(wcopy) * sizeof(float));
          if (TIFFWriteTile(tif, tbuf.data(), x0, y0, 0, 0) < 0) {
            set_err("tile write failed at page " + std::to_string(z));
            TIFFClose(tif);
            return -1;
          }
        }
      }
    } else {
      TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, static_cast<uint32_t>(comp == COMPRESSION_NONE ? ny : 64));
      for (int y = 0; y < ny; ++y) {
        if (TIFFWriteScanline(tif, const_cast<float*>(page + static_cast<size_t>(y) * nx), y) < 0) {
          set_err("write failed at page " + std::to_string(z) + " row " + std::to_string(y));
          TIFFClose(tif);
          return -1;
        }
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

int mt_tiff_write(const char* path, const float* data, int nz, int ny, int nx) {
  return mt_tiff_write_opts(path, data, nz, ny, nx, "none", 0, 0.0, 0.0, nullptr, 0);
}

}  // extern "C"
