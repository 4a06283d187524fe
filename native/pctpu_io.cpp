// Native IO accelerator for the pctpu host runtime: PNG encoding and
// multi-layer BEV writeback (bin + 24 PNGs per cloud), exposed through a
// C ABI for ctypes.  The reference's runtime is C++ (OpenCV imwrite /
// ofstream, /root/reference/BatchMultiBevGen.cpp:294-320); this is the
// TPU-framework equivalent: the device produces batched rasters, and this
// library drains them to disk without holding the GIL.
//
// Build: g++ -O2 -shared -fPIC -o libpctpu_io.so pctpu_io.cpp -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

void put_u32_be(std::vector<unsigned char>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<unsigned char>& out, const char tag[4],
               const unsigned char* payload, size_t n) {
  put_u32_be(out, static_cast<uint32_t>(n));
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), payload, payload + n);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(n + 4));
  put_u32_be(out, crc);
}

bool encode_png(const uint8_t* img, int h, int w, int level,
                std::vector<unsigned char>& out) {
  static const unsigned char sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.assign(sig, sig + 8);

  unsigned char ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 0;   // grayscale
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);

  // raw scanlines with filter byte 0
  std::vector<unsigned char> raw(static_cast<size_t>(h) * (w + 1));
  for (int r = 0; r < h; ++r) {
    raw[static_cast<size_t>(r) * (w + 1)] = 0;
    std::memcpy(&raw[static_cast<size_t>(r) * (w + 1) + 1], img + static_cast<size_t>(r) * w, w);
  }
  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<unsigned char> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(), static_cast<uLong>(raw.size()),
                level) != Z_OK) {
    return false;
  }
  put_chunk(out, "IDAT", comp.data(), bound);
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const std::string& path, const void* data, size_t n) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  size_t written = n ? std::fwrite(data, 1, n, f) : 0;
  std::fclose(f);
  return written == n;
}

}  // namespace

extern "C" {

// Encode + write one 8-bit grayscale PNG.  Returns 0 on success.
int pctpu_write_png(const uint8_t* img, int h, int w, int level,
                    const char* path) {
  std::vector<unsigned char> out;
  if (!encode_png(img, h, w, level, out)) return 1;
  return write_file(path, out.data(), out.size()) ? 0 : 2;
}

// Write one cloud's multi-BEV outputs: the raw layer-major binary and one
// PNG per layer named {img_dir}/{layer:02d}.png.  Returns 0 on success.
int pctpu_write_multi_bev(const uint8_t* multi, int layers, int h, int w,
                          const char* bin_path, const char* img_dir,
                          int level, int write_pngs) {
  size_t layer_bytes = static_cast<size_t>(h) * w;
  if (!write_file(bin_path, multi, layer_bytes * layers)) return 2;
  if (!write_pngs) return 0;
  mkdir(img_dir, 0777);  // ignore EEXIST
  char path[4096];
  for (int l = 0; l < layers; ++l) {
    std::snprintf(path, sizeof(path), "%s/%02d.png", img_dir, l);
    int rc = pctpu_write_png(multi + layer_bytes * l, h, w, level, path);
    if (rc != 0) return rc;
  }
  return 0;
}

// OpenCV FMT_CSV float matrix formatting: "%.<precision>g" per value,
// ", " separators, "\n" per row (no trailing newline for single-row mats —
// cv::Formatter semantics, see pctpu/io/csvfmt.py).  printf's %g is exactly
// what libopencv_core used, so this IS the reference byte format.  Returns
// bytes written, or -1 when out_cap would overflow.
long pctpu_format_csv_f32(const float* data, int h, int w, int precision,
                          char* out, long out_cap) {
  char fmt[16];
  std::snprintf(fmt, sizeof(fmt), "%%.%dg", precision);
  char tmp[64];
  long o = 0;
  for (int r = 0; r < h; ++r) {
    for (int c = 0; c < w; ++c) {
      // format into a local buffer first: snprintf returns the WOULD-BE
      // length on truncation, so writing straight into `out` and advancing
      // by the return value could push the separator writes past out_cap
      int len = std::snprintf(tmp, sizeof(tmp), fmt,
                              static_cast<double>(data[static_cast<long>(r) * w + c]));
      if (len < 0 || len >= static_cast<int>(sizeof(tmp))) return -1;
      if (o + len + 3 > out_cap) return -1;  // value + ", " or "\n"
      std::memcpy(out + o, tmp, len);
      o += len;
      if (c + 1 < w) {
        out[o++] = ',';
        out[o++] = ' ';
      }
    }
    if (h > 1) out[o++] = '\n';
  }
  return o;
}

// liblzf decompression (the PCD binary_compressed codec).  Returns the
// number of bytes written to out, or -1 on a corrupt stream / overflow.
long pctpu_lzf_decompress(const uint8_t* in, long in_len,
                          uint8_t* out, long out_cap) {
  long i = 0, o = 0;
  while (i < in_len) {
    unsigned ctrl = in[i++];
    if (ctrl < 32) {  // literal run of ctrl+1 bytes
      long run = static_cast<long>(ctrl) + 1;
      if (i + run > in_len || o + run > out_cap) return -1;
      std::memcpy(out + o, in + i, run);
      i += run;
      o += run;
    } else {  // back reference
      long len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -1;
        len += in[i++];
      }
      if (i >= in_len) return -1;
      long ref = o - (static_cast<long>(ctrl & 0x1F) << 8) - in[i++] - 1;
      len += 2;
      if (ref < 0 || o + len > out_cap) return -1;
      for (long k = 0; k < len; ++k) {  // may overlap: byte-by-byte
        out[o] = out[ref];
        ++o;
        ++ref;
      }
    }
  }
  return o;
}

}  // extern "C"
