// Native host-side runtime for ndt_slam_tpu: log parsing, scan
// resampling, PCD export.
//
// The TPU compute path is JAX/XLA (ndt_slam_tpu/ndt); this library
// covers the host data plane the way the reference covers it with
// C++ iostream parsing (reference: src/SlamLauncher.cpp:37-105,
// src/ScanPointResampler.cpp:4-62, PCD export via pcl::io,
// include/ndt_slam/PointCloudMap.h:124-136). Exposed as a plain C ABI
// consumed through ctypes (ndt_slam_tpu/io/native.py); every entry
// point has a pure-Python fallback with identical semantics, enforced
// by parity tests (tests/unit/test_native.py).
//
// Build: make -C csrc   (produces csrc/libndtslam.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Scan resampler: uniform arc-length re-spacing (reference semantics,
// src/ScanPointResampler.cpp:41-62): walk the polyline accumulating
// distance; drop points arriving before `space`; keep the raw point and
// reset on a discontinuity (>= space_thre); otherwise insert the point
// at exactly `space` along the segment and re-examine the current one.
// Matches ndt_slam_tpu/pre/resample.py::resample_points_np bit-for-bit
// (both walk in double precision, emit float32).
//
// Returns the number of output points written to out (capacity `cap`,
// [cap,2] float32); input xy is [n,2] float32.
int ndt_resample(const float* xy, int n, double space, double space_thre,
                 float* out, int cap) {
  if (n <= 0 || cap <= 0) return 0;
  int m = 0;
  double px = xy[0], py = xy[1];
  out[0] = (float)px;
  out[1] = (float)py;
  m = 1;
  double dis = 0.0;
  for (int i = 1; i < n && m < cap;) {
    const double cx = xy[2 * i], cy = xy[2 * i + 1];
    const double dx = cx - px, dy = cy - py;
    const double L = std::hypot(dx, dy);
    if (dis + L < space) {
      dis += L;
      px = cx;
      py = cy;
      ++i;
    } else if (dis + L >= space_thre) {
      out[2 * m] = (float)cx;
      out[2 * m + 1] = (float)cy;
      ++m;
      px = cx;
      py = cy;
      dis = 0.0;
      ++i;
    } else {
      const double ratio = (space - dis) / L;
      const double ix = px + dx * ratio, iy = py + dy * ratio;
      out[2 * m] = (float)ix;
      out[2 * m + 1] = (float)iy;
      ++m;
      px = ix;
      py = iy;
      dis = 0.0;
      // re-examine point i against the inserted point
    }
  }
  return m;
}

// ---------------------------------------------------------------------------
// Tsukuba-format log parser (reference format: 4 header lines, then
// per frame: stamp x y theta_deg image_name, followed by three point
// blocks "n x1 y1 ...", left/right kept only when sidelidar — but
// always consumed; reference: src/SlamLauncher.cpp:37-105,
// SURVEY.md §6.3 item 10).
//
// Two-call protocol:
//   1) handle = ndt_tsukuba_parse(path, sidelidar) -> opaque id (<0 on
//      error); ndt_tsukuba_counts(handle, &n_frames, &n_points_total)
//   2) ndt_tsukuba_fill(handle, stamps[i64 nF], poses[f32 nF*3],
//      offsets[i64 nF+1], pts[f32 nPts*2]); ndt_tsukuba_free(handle)

struct TsukubaLog {
  std::vector<int64_t> stamps;
  std::vector<float> poses;     // 3 per frame
  std::vector<int64_t> offsets; // nF+1 prefix sums into pts
  std::vector<float> pts;       // 2 per point
};

static std::vector<TsukubaLog*> g_logs;

static bool next_token(const char*& p, const char* end, const char*& tok,
                       size_t& len) {
  while (p < end && std::isspace((unsigned char)*p)) ++p;
  if (p >= end) return false;
  tok = p;
  while (p < end && !std::isspace((unsigned char)*p)) ++p;
  len = (size_t)(p - tok);
  return true;
}

int64_t ndt_tsukuba_parse(const char* path, int sidelidar) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && std::fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();
  // skip 4 header lines
  for (int k = 0; k < 4 && p < end; ++k) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }

  TsukubaLog* log = new TsukubaLog();
  log->offsets.push_back(0);
  const char* tok;
  size_t len;
  char tmp[64];

  auto tod = [&](double& v) -> bool {
    if (!next_token(p, end, tok, len)) return false;
    size_t c = len < 63 ? len : 63;
    std::memcpy(tmp, tok, c);
    tmp[c] = 0;
    char* e = nullptr;
    v = std::strtod(tmp, &e);
    return e != tmp;
  };

  while (true) {
    double stamp, tx, ty, th;
    if (!tod(stamp) || !tod(tx) || !tod(ty) || !tod(th)) break;
    if (!next_token(p, end, tok, len)) break;  // image name, ignored
    bool ok = true;
    std::vector<float> frame_pts;
    for (int block = 0; block < 3 && ok; ++block) {
      double nd;
      if (!tod(nd)) { ok = false; break; }
      long n = (long)nd;
      for (long j = 0; j < n; ++j) {
        double x, y;
        if (!tod(x) || !tod(y)) { ok = false; break; }
        if (block == 0 || sidelidar) {
          frame_pts.push_back((float)x);
          frame_pts.push_back((float)y);
        }
      }
    }
    if (!ok) break;  // truncated tail: EOF terminates (reference parity)
    log->stamps.push_back((int64_t)stamp);
    log->poses.push_back((float)tx);
    log->poses.push_back((float)ty);
    log->poses.push_back((float)th);
    log->pts.insert(log->pts.end(), frame_pts.begin(), frame_pts.end());
    log->offsets.push_back((int64_t)(log->pts.size() / 2));
  }

  g_logs.push_back(log);
  return (int64_t)(g_logs.size() - 1);
}

int ndt_tsukuba_counts(int64_t handle, int64_t* n_frames,
                       int64_t* n_points_total) {
  if (handle < 0 || (size_t)handle >= g_logs.size() || !g_logs[handle])
    return -1;
  TsukubaLog* log = g_logs[handle];
  *n_frames = (int64_t)log->stamps.size();
  *n_points_total = (int64_t)(log->pts.size() / 2);
  return 0;
}

int ndt_tsukuba_fill(int64_t handle, int64_t* stamps, float* poses,
                     int64_t* offsets, float* pts) {
  if (handle < 0 || (size_t)handle >= g_logs.size() || !g_logs[handle])
    return -1;
  TsukubaLog* log = g_logs[handle];
  std::memcpy(stamps, log->stamps.data(),
              log->stamps.size() * sizeof(int64_t));
  std::memcpy(poses, log->poses.data(), log->poses.size() * sizeof(float));
  std::memcpy(offsets, log->offsets.data(),
              log->offsets.size() * sizeof(int64_t));
  std::memcpy(pts, log->pts.data(), log->pts.size() * sizeof(float));
  return 0;
}

void ndt_tsukuba_free(int64_t handle) {
  if (handle >= 0 && (size_t)handle < g_logs.size() && g_logs[handle]) {
    delete g_logs[handle];
    g_logs[handle] = nullptr;
  }
}

// ---------------------------------------------------------------------------
// CARMEN log parser (FLASER / ROBOTLASER1 — Intel/ACES/MIT-Killian
// benchmark format). Semantics mirror ndt_slam_tpu/io/carmen.py
// exactly (angles, cutoffs, laser-pose selection, degrees at the
// boundary); parity enforced by tests/unit/test_native.py. Handles
// share the registry + counts/fill/free protocol with the Tsukuba
// parser above.

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

static bool line_tod(const char*& p, const char* lend, double& v) {
  const char* tok;
  size_t len;
  if (!next_token(p, lend, tok, len)) return false;
  char tmp[64];
  size_t c = len < 63 ? len : 63;
  std::memcpy(tmp, tok, c);
  tmp[c] = 0;
  char* e = nullptr;
  v = std::strtod(tmp, &e);
  return e != tmp;
}

int64_t ndt_carmen_parse(const char* path, double max_range,
                         double fov_rad, int64_t max_frames) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && std::fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  TsukubaLog* log = new TsukubaLog();
  log->offsets.push_back(0);
  std::vector<double> r;

  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t sid = 0;
  while (p < end) {
    if (max_frames >= 0 && sid >= max_frames) break;
    const char* lend = p;
    while (lend < end && *lend != '\n') ++lend;
    const char* lp = p;
    const char* next = (lend < end) ? lend + 1 : end;

    const char* tok;
    size_t len;
    double x = 0, y = 0, th = 0, cutoff = max_range;
    bool have = false;
    r.clear();
    if (next_token(lp, lend, tok, len)) {
      if (len == 6 && std::memcmp(tok, "FLASER", 6) == 0) {
        double nd;
        if (line_tod(lp, lend, nd)) {
          long n = (long)nd;
          bool ok = n >= 0;
          r.reserve((size_t)(n > 0 ? n : 0));
          for (long j = 0; j < n && ok; ++j) {
            double v;
            ok = line_tod(lp, lend, v);
            if (ok) r.push_back(v);
          }
          double ox, oy, oth;  // odometry triple must exist (parity:
                               // carmen.py:65 requires >= 6 trailing)
          if (ok && line_tod(lp, lend, x) && line_tod(lp, lend, y) &&
              line_tod(lp, lend, th) && line_tod(lp, lend, ox) &&
              line_tod(lp, lend, oy) && line_tod(lp, lend, oth)) {
            have = true;
            const double nm1 = (double)(n - 1 > 1 ? n - 1 : 1);
            // angles: -fov/2 + fov*i/(n-1) — matches carmen.py:69-71
            for (size_t i = 0; i < r.size(); ++i) {
              const double a =
                  -fov_rad / 2.0 + fov_rad * (double)i / nm1;
              if (r[i] > 0.05 && r[i] < cutoff) {
                log->pts.push_back((float)(r[i] * std::cos(a)));
                log->pts.push_back((float)(r[i] * std::sin(a)));
              }
            }
          }
        }
      } else if (len == 11 && std::memcmp(tok, "ROBOTLASER1", 11) == 0) {
        double laser_type, start_angle, fov_decl, ang_res, sensor_max,
            acc, rem_mode, nd;
        if (line_tod(lp, lend, laser_type) &&
            line_tod(lp, lend, start_angle) &&
            line_tod(lp, lend, fov_decl) && line_tod(lp, lend, ang_res) &&
            line_tod(lp, lend, sensor_max) && line_tod(lp, lend, acc) &&
            line_tod(lp, lend, rem_mode) && line_tod(lp, lend, nd)) {
          long n = (long)nd;
          bool ok = n >= 0;
          r.clear();
          r.reserve((size_t)(n > 0 ? n : 0));
          for (long j = 0; j < n && ok; ++j) {
            double v;
            ok = line_tod(lp, lend, v);
            if (ok) r.push_back(v);
          }
          double n_rem_d = 0;
          if (ok && line_tod(lp, lend, n_rem_d)) {
            long n_rem = (long)n_rem_d;
            for (long j = 0; j < n_rem && ok; ++j) {
              double v;
              ok = line_tod(lp, lend, v);
            }
            double ox, oy, oth;  // parity: carmen.py:86 requires base+6
            if (ok && line_tod(lp, lend, x) && line_tod(lp, lend, y) &&
                line_tod(lp, lend, th) && line_tod(lp, lend, ox) &&
                line_tod(lp, lend, oy) && line_tod(lp, lend, oth)) {
              have = true;
              const double sm = sensor_max - 1e-3;
              cutoff = max_range < sm ? max_range : sm;
              for (size_t i = 0; i < r.size(); ++i) {
                const double a = start_angle + ang_res * (double)i;
                if (r[i] > 0.05 && r[i] < cutoff) {
                  log->pts.push_back((float)(r[i] * std::cos(a)));
                  log->pts.push_back((float)(r[i] * std::sin(a)));
                }
              }
            }
          }
        }
      }
    }
    if (have) {
      log->stamps.push_back(sid);
      log->poses.push_back((float)x);
      log->poses.push_back((float)y);
      log->poses.push_back((float)(th * (180.0 / M_PI)));
      log->offsets.push_back((int64_t)(log->pts.size() / 2));
      ++sid;
    }
    p = next;
  }
  g_logs.push_back(log);
  return (int64_t)(g_logs.size() - 1);
}

// ---------------------------------------------------------------------------
// ASCII PCD writer (z=0, matching pcl::io::savePCDFileASCII output the
// reference produces, include/ndt_slam/PointCloudMap.h:124-136; format
// kept identical to ndt_slam_tpu/io/pcd.py::save_pcd).
int ndt_write_pcd(const char* path, const float* xy, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\n"
               "VERSION 0.7\n"
               "FIELDS x y z\n"
               "SIZE 4 4 4\n"
               "TYPE F F F\n"
               "COUNT 1 1 1\n"
               "WIDTH %lld\n"
               "HEIGHT 1\n"
               "VIEWPOINT 0 0 0 1 0 0 0\n"
               "POINTS %lld\n"
               "DATA ascii\n",
               (long long)n, (long long)n);
  for (int64_t i = 0; i < n; ++i) {
    std::fprintf(f, "%g %g 0\n", xy[2 * i], xy[2 * i + 1]);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
