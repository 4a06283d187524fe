// Single-core CPU baseline for the flagship hot loop: cylindrical ordering +
// ground marking + multi/single BEV rasterization, written per-point/loop
// style like the reference toolchain (PCL-free re-implementation of the same
// algorithm; see SURVEY.md §2.4 for the semantics).  Used by bench.py to
// self-measure the reference-equivalent single-core throughput, since the
// reference publishes no numbers and PCL is unavailable in this image
// (BASELINE.md "Baseline protocol").
//
// With an <io_dir> argument the timed span additionally performs the
// reference's IN-SPAN artifact writes — the reference's [TIME] bracket
// (/root/reference/BatchMultiBevGen.cpp:731-749) covers computeAndSave{Multi,
// Single}Bev INCLUDING the layer-major .bin, the per-cloud `access`+`system
// ("mkdir -p ...")`, 24 per-layer PNGs + 1 single-BEV PNG (cv::imwrite), and
// the FMT_CSV export (:295-320, :352-372).  The PNG encoder emulates
// OpenCV's default imwrite path (grfmt_png: libpng with PNG_FILTER_SUB,
// zlib Z_BEST_SPEED, strategy Z_RLE) so the write cost is the reference's,
// not a strawman.  Only the labeled-PCD save (:756) is outside the bracket
// and stays excluded.
//
// Build: g++ -O2 -o baseline_bev baseline_bev.cpp -lz
// Run:   ./baseline_bev <n_clouds> <n_points> [io_dir]
//        → one JSON line on stdout (ms_per_cloud; full span when io_dir set).

#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <fstream>
#include <random>
#include <string>
#include <unistd.h>
#include <vector>

namespace {

constexpr int kNScan = 64;
constexpr int kHorizon = 2083;
constexpr int kGroundUpper = 50;
constexpr float kHeightRes = 0.25f;
constexpr int kGrid = kNScan * kHorizon;
constexpr int kSectRows = 75;
constexpr int kSectCols = 50;
constexpr int kBev = 224;
constexpr int kLayers = 24;

struct Pt {
  float x = 0, y = 0, z = 0, intensity = 0;
  std::uint16_t row = 0, col = 0;
  std::int16_t label = 0;
};

int sectorRow(float x) {
  int r = static_cast<int>(std::floor((x + 75.0) / 2.0));
  return r < 0 ? 0 : (r >= kSectRows ? kSectRows - 1 : r);
}
int sectorCol(float y) {
  int c = static_cast<int>(std::floor((y + 50.0) / 2.0));
  return c < 0 ? 0 : (c >= kSectCols ? kSectCols - 1 : c);
}

void orderCloud(const std::vector<Pt>& in, std::vector<Pt>& grid) {
  grid.assign(kGrid, Pt{});
  for (const Pt& p : in) {
    if (p.row >= kNScan || p.col >= kHorizon) continue;
    grid[p.row * kHorizon + p.col] = p;
  }
}

void markGround(std::vector<Pt>& g, std::vector<std::int8_t>& gm) {
  gm.assign(kGrid, 0);
  std::vector<float> heights(kSectRows * kSectCols, 0.0f);
  std::vector<float> counts(kSectRows * kSectCols, 0.01f);

  for (int c = 0; c < kHorizon; ++c) {
    for (int r = kNScan - 1; r > kNScan - kGroundUpper - 1; --r) {
      std::size_t lo = r * kHorizon + c;
      std::size_t up = (r - 1) * kHorizon + c;
      if (g[up].intensity == -1) up = (r - 1) * kHorizon + (c + 2) % kHorizon;
      if (g[up].intensity == -1) up = (r - 1) * kHorizon + (c - 2) % kHorizon;
      if (g[up].intensity == -1 && r >= 2) up = (r - 2) * kHorizon + c;
      if (g[lo].intensity == -1 || g[up].intensity == -1) {
        gm[r * kHorizon + c] = -1;
        continue;
      }
      float dx = g[up].x - g[lo].x, dy = g[up].y - g[lo].y, dz = g[up].z - g[lo].z;
      float ang = std::atan2(dz, std::sqrt(dx * dx + dy * dy)) * 180.0f / float(M_PI);
      if (std::fabs(ang) <= 10.0f) {
        gm[r * kHorizon + c] = 1;
        gm[(r - 1) * kHorizon + c] = 1;
      }
    }
  }
  for (int i = 0; i < kGrid; ++i) {
    if (gm[i] != 1) continue;
    int s = sectorRow(g[i].x) * kSectCols + sectorCol(g[i].y);
    heights[s] += g[i].z;
    counts[s] += 1;
  }
  for (int s = 0; s < kSectRows * kSectCols; ++s) heights[s] /= counts[s];
  static const int kNbr[4][2] = {{-1, 0}, {0, 1}, {0, -1}, {1, 0}};
  for (int i = 0; i < kGrid; ++i) {
    int sr = sectorRow(g[i].x), sc = sectorCol(g[i].y);
    for (auto& d : kNbr) {
      int nr = sr + d[0], nc = sc + d[1];
      if (nr < 0 || nr >= kSectRows || nc < 0 || nc >= kSectCols) continue;
      if (g[i].z - heights[nr * kSectCols + nc] > 0.30) {
        gm[i] = 0;
        break;
      }
    }
    if (gm[i] == 1) g[i].label = 0;
  }
}

void rasterize(const std::vector<Pt>& g, std::vector<std::uint8_t>& multi,
               std::vector<std::uint8_t>& single) {
  multi.assign(kLayers * kBev * kBev, 0);
  single.assign(kBev * kBev, 0);
  for (const Pt& p : g) {
    int x = static_cast<int>(std::round((p.x + 112.f) / 1.0f + 0.5));
    int y = static_cast<int>(std::round((p.y + 112.f) / 1.0f + 0.5));
    if (x < 0 || x >= kBev || y < 0 || y >= kBev || p.label == 0) continue;
    int layer = static_cast<int>(std::round(p.z / kHeightRes + 2.0f));
    if (layer >= 0 && layer < kLayers) {
      std::uint8_t& cell = multi[(layer * kBev + x) * kBev + y];
      if (cell == 0) cell = 255;
    }
    int h = static_cast<int>((p.z + 2.0) * 4.0);
    h = h < 0 ? 0 : (h > 255 ? 255 : h);
    std::uint8_t& sc = single[x * kBev + y];
    if (sc < h) sc = static_cast<std::uint8_t>(h);
  }
}

// --- reference in-span artifact writes --------------------------------------
//
// PNG encoder emulating cv::imwrite's DEFAULT configuration (OpenCV
// grfmt_png.cpp: when no IMWRITE_PNG_COMPRESSION param is given it sets
// png_set_filter(PNG_FILTER_SUB) + png_set_compression_level(Z_BEST_SPEED)
// with the default strategy IMWRITE_PNG_STRATEGY_RLE).  Same container
// chunks, same filter, same zlib parameters → same per-image encode cost as
// the reference's cv::imwrite on these rasters.

void putU32BE(std::vector<unsigned char>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void putChunk(std::vector<unsigned char>& out, const char tag[4],
              const unsigned char* payload, size_t n) {
  putU32BE(out, static_cast<uint32_t>(n));
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  if (n) out.insert(out.end(), payload, payload + n);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(n + 4));
  putU32BE(out, crc);
}

bool writePngCvDefault(const std::string& path, const uint8_t* img, int h,
                       int w) {
  static const unsigned char sig[8] = {0x89, 'P', 'N', 'G',
                                       '\r', '\n', 0x1a, '\n'};
  std::vector<unsigned char> out(sig, sig + 8);
  unsigned char ihdr[13] = {};
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;  // bit depth, grayscale, no compression/filter/interlace extras
  putChunk(out, "IHDR", ihdr, 13);

  // SUB-filtered scanlines (filter id 1: raw[i] - raw[i-1]) — libpng applies
  // the filter before deflate; PNG_FILTER_SUB is what OpenCV selects
  std::vector<unsigned char> raw(static_cast<size_t>(h) * (w + 1));
  for (int r = 0; r < h; ++r) {
    unsigned char* line = &raw[static_cast<size_t>(r) * (w + 1)];
    const uint8_t* src = img + static_cast<size_t>(r) * w;
    line[0] = 1;  // SUB
    line[1] = src[0];
    for (int c = 1; c < w; ++c) line[c + 1] = (unsigned char)(src[c] - src[c - 1]);
  }
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit2(&zs, Z_BEST_SPEED, Z_DEFLATED, 15, 8, Z_RLE) != Z_OK)
    return false;
  std::vector<unsigned char> comp(deflateBound(&zs, (uLong)raw.size()));
  zs.next_in = raw.data();
  zs.avail_in = (uInt)raw.size();
  zs.next_out = comp.data();
  zs.avail_out = (uInt)comp.size();
  int rc = deflate(&zs, Z_FINISH);
  size_t comp_n = zs.total_out;
  deflateEnd(&zs);
  if (rc != Z_STREAM_END) return false;
  putChunk(out, "IDAT", comp.data(), comp_n);
  putChunk(out, "IEND", nullptr, 0);
  std::FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  size_t written = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return written == out.size();
}

// computeAndSaveMultiBev's write tail (BatchMultiBevGen.cpp:295-320): one
// layer-major binary via ofstream row writes, access()+system("mkdir -p")
// for the per-cloud image dir, then one cv::imwrite PNG per layer.
void writeMultiBevArtifacts(const std::string& io_dir, int cloud_idx,
                            const std::vector<std::uint8_t>& multi) {
  char buf[512];
  std::snprintf(buf, sizeof(buf), "%s/binary/%06d.bin", io_dir.c_str(),
                cloud_idx);
  std::ofstream f_bin(buf, std::ofstream::binary);
  std::snprintf(buf, sizeof(buf), "%s/image/%06d/", io_dir.c_str(), cloud_idx);
  std::string img_dir = buf;
  if (access(img_dir.c_str(), 0) == -1) {
    int _ __attribute__((unused)) = system(("mkdir -p " + img_dir).c_str());
  }
  for (int l = 0; l < kLayers; ++l) {
    const std::uint8_t* layer = multi.data() + static_cast<size_t>(l) * kBev * kBev;
    for (int r = 0; r < kBev; ++r)
      f_bin.write(reinterpret_cast<const char*>(layer + r * kBev), kBev);
    std::snprintf(buf, sizeof(buf), "%s%02d.png", img_dir.c_str(), l);
    writePngCvDefault(buf, layer, kBev, kBev);
  }
  f_bin.close();
}

// computeAndSaveSingleBev's write tail (BatchMultiBevGen.cpp:352-372): one
// cv::imwrite PNG + the FMT_CSV export ("%3d" per uint8 value, ", "
// separators, "\n" per row — cv::Formatter semantics, pctpu/io/csvfmt.py).
void writeSingleBevArtifacts(const std::string& io_dir, int cloud_idx,
                             const std::vector<std::uint8_t>& single) {
  char buf[512];
  std::snprintf(buf, sizeof(buf), "%s/single_image/%06d.png", io_dir.c_str(),
                cloud_idx);
  writePngCvDefault(buf, single.data(), kBev, kBev);
  std::snprintf(buf, sizeof(buf), "%s/single_csv/%06d.csv", io_dir.c_str(),
                cloud_idx);
  std::ofstream f_csv(buf);
  std::string row;
  row.reserve(kBev * 5 + 1);
  char cell[8];
  for (int r = 0; r < kBev; ++r) {
    row.clear();
    for (int c = 0; c < kBev; ++c) {
      std::snprintf(cell, sizeof(cell), c + 1 < kBev ? "%3d, " : "%3d\n",
                    int(single[static_cast<size_t>(r) * kBev + c]));
      row += cell;
    }
    f_csv << row;
  }
  f_csv.close();
}

std::vector<Pt> synthCloud(std::mt19937& rng, int n) {
  std::uniform_real_distribution<float> ur(0.f, 1.f);
  std::vector<Pt> out(n);
  for (int i = 0; i < n; ++i) {
    Pt& p = out[i];
    float range = 3.0f + 97.0f * ur(rng);
    float az = 2.0f * float(M_PI) * ur(rng);
    p.x = range * std::cos(az);
    p.y = range * std::sin(az);
    bool ground = ur(rng) < 0.5f;
    p.z = ground ? -2.0f + 0.2f * ur(rng) : -1.0f + 7.0f * ur(rng);
    p.intensity = ur(rng);
    p.row = static_cast<std::uint16_t>(ur(rng) * kNScan) % kNScan;
    p.col = static_cast<std::uint16_t>(ur(rng) * kHorizon) % kHorizon;
    p.label = -2;
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  int n_clouds = argc > 1 ? std::atoi(argv[1]) : 20;
  int n_points = argc > 2 ? std::atoi(argv[2]) : 120000;
  std::string io_dir = argc > 3 ? argv[3] : "";
  std::mt19937 rng(0);

  std::vector<std::vector<Pt>> clouds;
  clouds.reserve(n_clouds);
  for (int i = 0; i < n_clouds; ++i) clouds.push_back(synthCloud(rng, n_points));

  if (!io_dir.empty()) {
    // The reference creates the top-level output dirs at startup, outside
    // the [TIME] bracket (BatchMultiBevGen.cpp:707-719); only the per-cloud
    // image dir's access()+system("mkdir -p") is in-span.
    for (const char* sub : {"/binary", "/image", "/single_image", "/single_csv"}) {
      int _ __attribute__((unused)) =
          system(("mkdir -p " + io_dir + sub).c_str());
    }
  }

  std::vector<Pt> grid;
  std::vector<std::int8_t> gm;
  std::vector<std::uint8_t> multi, single;
  volatile std::uint64_t sink = 0;

  auto t0 = std::chrono::steady_clock::now();
  int idx = 0;
  for (const auto& cloud : clouds) {
    orderCloud(cloud, grid);
    markGround(grid, gm);
    rasterize(grid, multi, single);
    if (!io_dir.empty()) {
      writeMultiBevArtifacts(io_dir, idx, multi);
      writeSingleBevArtifacts(io_dir, idx, single);
    }
    sink += multi[0] + single[0];
    ++idx;
  }
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / n_clouds;
  std::printf(
      "{\"ms_per_cloud\": %.3f, \"n_clouds\": %d, \"n_points\": %d, "
      "\"full_span\": %s}\n",
      ms, n_clouds, n_points, io_dir.empty() ? "false" : "true");
  return sink == 0xdeadbeef ? 1 : 0;
}
