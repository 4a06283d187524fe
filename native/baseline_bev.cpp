// Single-core CPU baseline for the flagship hot loop: cylindrical ordering +
// ground marking + multi/single BEV rasterization, written per-point/loop
// style like the reference toolchain (PCL-free re-implementation of the same
// algorithm; see SURVEY.md §2.4 for the semantics).  Used by bench.py to
// self-measure the reference-equivalent single-core throughput, since the
// reference publishes no numbers and PCL is unavailable in this image
// (BASELINE.md "Baseline protocol").
//
// Build: g++ -O2 -o baseline_bev baseline_bev.cpp
// Run:   ./baseline_bev <n_clouds> <n_points>  → one JSON line on stdout.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
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
  std::mt19937 rng(0);

  std::vector<std::vector<Pt>> clouds;
  clouds.reserve(n_clouds);
  for (int i = 0; i < n_clouds; ++i) clouds.push_back(synthCloud(rng, n_points));

  std::vector<Pt> grid;
  std::vector<std::int8_t> gm;
  std::vector<std::uint8_t> multi, single;
  volatile std::uint64_t sink = 0;

  auto t0 = std::chrono::steady_clock::now();
  for (const auto& cloud : clouds) {
    orderCloud(cloud, grid);
    markGround(grid, gm);
    rasterize(grid, multi, single);
    sink += multi[0] + single[0];
  }
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / n_clouds;
  std::printf("{\"ms_per_cloud\": %.3f, \"n_clouds\": %d, \"n_points\": %d}\n",
              ms, n_clouds, n_points);
  return sink == 0xdeadbeef ? 1 : 0;
}
