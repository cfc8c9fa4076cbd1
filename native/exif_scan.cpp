// Fast batch EXIF scanner + threaded prefetch for the host data loader.
//
// The reference's epoch-map construction parses EXIF with python
// `exifread` one image at a time over the whole season — an IO/parse
// bound hot loop (ref core/epoch.py:246-283, core/images.py:592-609).
// This native scanner mmap-free reads only the JPEG APP1 header of each
// file and walks the TIFF IFDs for DateTimeOriginal / FocalLength, with
// a std::thread pool across files.
//
// Exposed C ABI (ctypes):
//   exif_scan_batch(paths, n, out_datetimes, out_focals, n_threads)
//     paths: array of NUL-terminated UTF-8 file paths
//     out_datetimes: n * 20 bytes ("YYYY:MM:DD HH:MM:SS\0", empty if absent)
//     out_focals: n doubles (NaN if absent)
// Returns 0 on success.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr size_t kHeaderBytes = 128 * 1024;  // APP1 lives in the head
constexpr uint16_t kTagDateTimeOriginal = 0x9003;
constexpr uint16_t kTagDateTime = 0x0132;
constexpr uint16_t kTagFocalLength = 0x920A;
constexpr uint16_t kTagExifIFD = 0x8769;

struct Result {
  char datetime[20] = {0};
  double focal = NAN;
};

uint16_t rd16(const uint8_t* p, bool le) {
  return le ? (p[0] | (p[1] << 8)) : ((p[0] << 8) | p[1]);
}

uint32_t rd32(const uint8_t* p, bool le) {
  return le ? (p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24))
            : (((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]);
}

// Walk one IFD; record tags; return offset of the Exif sub-IFD if seen.
void walk_ifd(const uint8_t* tiff, size_t len, uint32_t off, bool le,
              Result* out, uint32_t* exif_ifd) {
  if (off + 2 > len) return;
  uint16_t n = rd16(tiff + off, le);
  for (uint16_t i = 0; i < n; ++i) {
    size_t e = off + 2 + 12 * (size_t)i;
    if (e + 12 > len) return;
    uint16_t tag = rd16(tiff + e, le);
    uint16_t type = rd16(tiff + e + 2, le);
    uint32_t count = rd32(tiff + e + 4, le);
    const uint8_t* val = tiff + e + 8;
    // size per type (only the ones we need)
    uint32_t tsz = (type == 3) ? 2 : (type == 5 || type == 10) ? 8
                   : (type == 4 || type == 9) ? 4 : 1;
    uint64_t nbytes = (uint64_t)tsz * count;
    if (nbytes > 4) {
      uint32_t voff = rd32(val, le);
      if ((uint64_t)voff + nbytes > len) continue;
      val = tiff + voff;
    }
    if ((tag == kTagDateTimeOriginal ||
         (tag == kTagDateTime && out->datetime[0] == 0)) &&
        type == 2 && count >= 19) {
      memcpy(out->datetime, val, 19);
      out->datetime[19] = 0;
    } else if (tag == kTagFocalLength && type == 5 && count >= 1) {
      uint32_t num = rd32(val, le);
      uint32_t den = rd32(val + 4, le);
      if (den) out->focal = (double)num / (double)den;
    } else if (tag == kTagExifIFD && (type == 4 || type == 3)) {
      *exif_ifd = rd32(val, le);
    }
  }
}

Result scan_one(const char* path) {
  Result out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  std::vector<uint8_t> buf(kHeaderBytes);
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return out;  // not JPEG

  // scan JPEG segments for APP1/Exif
  size_t pos = 2;
  while (pos + 4 <= got) {
    if (buf[pos] != 0xFF) break;
    uint8_t marker = buf[pos + 1];
    if (marker == 0xDA) break;  // start of scan: no more metadata
    uint16_t seglen = (buf[pos + 2] << 8) | buf[pos + 3];
    if (seglen < 2) break;
    if (marker == 0xE1 && pos + 4 + 6 <= got &&
        memcmp(buf.data() + pos + 4, "Exif\0\0", 6) == 0) {
      const uint8_t* tiff = buf.data() + pos + 10;
      size_t len = std::min((size_t)seglen - 8, got - pos - 10);
      if (len < 8) break;
      bool le = (tiff[0] == 'I');
      uint32_t ifd0 = rd32(tiff + 4, le);
      uint32_t exif_ifd = 0;
      walk_ifd(tiff, len, ifd0, le, &out, &exif_ifd);
      if (exif_ifd) walk_ifd(tiff, len, exif_ifd, le, &out, &exif_ifd);
      break;
    }
    pos += 2 + seglen;
  }
  return out;
}

}  // namespace

extern "C" int exif_scan_batch(const char** paths, int n,
                               char* out_datetimes, double* out_focals,
                               int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  n_threads = std::min(n_threads, n);

  auto work = [&](int t) {
    for (int i = t; i < n; i += n_threads) {
      Result r = scan_one(paths[i]);
      memcpy(out_datetimes + 20 * (size_t)i, r.datetime, 20);
      out_focals[i] = r.focal;
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
  return 0;
}
