// Native trajectory-validation oracle for the TPU motion-planning framework.
//
// Replaces the reference's PyBullet success oracle (lib/environment.py:632-680:
// execute the 50-waypoint trajectory under position control, any contact with
// any obstacle => failure) with a deterministic geometric check: forward
// kinematics at densely interpolated configurations along each segment, and
// OBB-vs-OBB separating-axis tests between the 9 vendored link boxes and every
// obstacle box.  No physics stepping, no wall-clock sleeps (the reference
// sleeps 0.4 s per waypoint), no GUI.
//
// Exposed as a C ABI for ctypes.  Robot geometry (DH table, link static
// frames, link box dims) is injected once from Python so the constants live in
// a single source of truth (edmp_tpu/constants.py).

#include <cmath>
#include <cstring>

namespace {

constexpr int kNumJoints = 7;
constexpr int kNumLinks = 9;
constexpr int kDhRows = 10;

struct Mat4 {
  double m[16];
};

// Injected robot model.
double g_dh[kDhRows][4];          // a, d, alpha, theta_offset
double g_frames[kNumLinks][16];   // joint-frame -> box-center transforms
double g_half[kNumLinks][3];      // box half extents
int g_link_joint[kNumLinks];      // which joint frame each box rides on (1-based)
bool g_ready = false;

inline void mat_identity(Mat4& o) {
  std::memset(o.m, 0, sizeof(o.m));
  o.m[0] = o.m[5] = o.m[10] = o.m[15] = 1.0;
}

inline void mat_mul(const Mat4& a, const Mat4& b, Mat4& o) {
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
      o.m[i * 4 + j] = s;
    }
  }
}

// Craig-convention DH step (matches lib/guide.py:45-72 layout).
inline void dh_step(int row, double q, Mat4& o) {
  const double a = g_dh[row][0];
  const double d = g_dh[row][1];
  const double al = g_dh[row][2];
  const double th = q + g_dh[row][3];
  const double ca = std::cos(al), sa = std::sin(al);
  const double cq = std::cos(th), sq = std::sin(th);
  o.m[0] = cq;      o.m[1] = -sq;     o.m[2] = 0;   o.m[3] = a;
  o.m[4] = sq * ca; o.m[5] = cq * ca; o.m[6] = -sa; o.m[7] = -sa * d;
  o.m[8] = sq * sa; o.m[9] = cq * sa; o.m[10] = ca; o.m[11] = ca * d;
  o.m[12] = 0;      o.m[13] = 0;      o.m[14] = 0;  o.m[15] = 1;
}

struct Obb {
  double c[3];    // center
  double r[9];    // rotation, row-major
  double h[3];    // half extents
};

// World-space link boxes at configuration q[7].
void link_boxes(const double* q, Obb out[kNumLinks]) {
  Mat4 T, step, tmp;
  Mat4 joints[kNumJoints];
  mat_identity(T);
  for (int i = 0; i < kNumJoints; ++i) {
    dh_step(i, q[i], step);
    mat_mul(T, step, tmp);
    T = tmp;
    joints[i] = T;
  }
  for (int l = 0; l < kNumLinks; ++l) {
    const Mat4& J = joints[g_link_joint[l] - 1];
    Mat4 F, W;
    std::memcpy(F.m, g_frames[l], sizeof(F.m));
    mat_mul(J, F, W);
    Obb& b = out[l];
    for (int i = 0; i < 3; ++i) {
      b.c[i] = W.m[i * 4 + 3];
      for (int j = 0; j < 3; ++j) b.r[i * 3 + j] = W.m[i * 4 + j];
      b.h[i] = g_half[l][i];
    }
  }
}

// Separating-axis OBB intersection test (15 axes).
bool obb_intersect(const Obb& A, const Obb& B) {
  constexpr double kEps = 1e-9;
  double R[3][3], AbsR[3][3];
  // rotation of B expressed in A's frame: R = A.r^T * B.r
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A.r[k * 3 + i] * B.r[k * 3 + j];
      R[i][j] = s;
      AbsR[i][j] = std::fabs(s) + kEps;
    }
  // translation in A's frame
  double d[3] = {B.c[0] - A.c[0], B.c[1] - A.c[1], B.c[2] - A.c[2]};
  double t[3];
  for (int i = 0; i < 3; ++i)
    t[i] = d[0] * A.r[0 * 3 + i] + d[1] * A.r[1 * 3 + i] + d[2] * A.r[2 * 3 + i];

  // axes of A
  for (int i = 0; i < 3; ++i) {
    const double ra = A.h[i];
    const double rb = B.h[0] * AbsR[i][0] + B.h[1] * AbsR[i][1] + B.h[2] * AbsR[i][2];
    if (std::fabs(t[i]) > ra + rb) return false;
  }
  // axes of B
  for (int j = 0; j < 3; ++j) {
    const double ra = A.h[0] * AbsR[0][j] + A.h[1] * AbsR[1][j] + A.h[2] * AbsR[2][j];
    const double rb = B.h[j];
    const double tt = std::fabs(t[0] * R[0][j] + t[1] * R[1][j] + t[2] * R[2][j]);
    if (tt > ra + rb) return false;
  }
  // cross products A_i x B_j
  static const int n1[3] = {1, 2, 0}, n2[3] = {2, 0, 1};
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) {
      const double ra = A.h[n1[i]] * AbsR[n2[i]][j] + A.h[n2[i]] * AbsR[n1[i]][j];
      const double rb = B.h[n1[j]] * AbsR[i][n2[j]] + B.h[n2[j]] * AbsR[i][n1[j]];
      const double tt = std::fabs(t[n2[i]] * R[n1[i]][j] - t[n1[i]] * R[n2[i]][j]);
      if (tt > ra + rb) return false;
    }
  }
  return true;
}

void quat_to_rot(const double* q_xyzw, double* r) {
  const double x = q_xyzw[0], y = q_xyzw[1], z = q_xyzw[2], w = q_xyzw[3];
  const double n = std::sqrt(x * x + y * y + z * z + w * w);
  const double xi = x / n, yi = y / n, zi = z / n, wi = w / n;
  r[0] = 1 - 2 * (yi * yi + zi * zi);
  r[1] = 2 * (xi * yi - zi * wi);
  r[2] = 2 * (xi * zi + yi * wi);
  r[3] = 2 * (xi * yi + zi * wi);
  r[4] = 1 - 2 * (xi * xi + zi * zi);
  r[5] = 2 * (yi * zi - xi * wi);
  r[6] = 2 * (xi * zi - yi * wi);
  r[7] = 2 * (yi * zi + xi * wi);
  r[8] = 1 - 2 * (xi * xi + yi * yi);
}

bool config_in_collision(const double* q, const Obb* obs, int n_obs) {
  Obb links[kNumLinks];
  link_boxes(q, links);
  for (int l = 0; l < kNumLinks; ++l)
    for (int o = 0; o < n_obs; ++o)
      if (obb_intersect(links[l], obs[o])) return true;
  return false;
}

}  // namespace

extern "C" {

// Inject robot geometry (all row-major doubles).
void edmp_set_robot(const double* dh_10x4, const double* frames_9x16,
                    const double* half_dims_9x3, const int* link_joint_9) {
  std::memcpy(g_dh, dh_10x4, sizeof(g_dh));
  std::memcpy(g_frames, frames_9x16, sizeof(g_frames));
  std::memcpy(g_half, half_dims_9x3, sizeof(g_half));
  std::memcpy(g_link_joint, link_joint_9, sizeof(g_link_joint));
  g_ready = true;
}

// Validate one trajectory.
//   traj:      (n_waypoints, 7) row-major joint configurations
//   obstacles: (n_obs, 10) rows of [center(3), quat_xyzw(4), dims(3)]
//   substeps:  interpolated checks per segment (>=1)
// Returns 1 if collision-free, 0 on collision (first colliding segment in
// *first_bad_segment, -1 if clean), -2 if geometry not injected.
int edmp_validate_trajectory(const double* traj, int n_waypoints,
                             const double* obstacles, int n_obs, int substeps,
                             int* first_bad_segment) {
  if (!g_ready) return -2;
  if (first_bad_segment) *first_bad_segment = -1;
  if (substeps < 1) substeps = 1;

  Obb* obs = new Obb[n_obs > 0 ? n_obs : 1];
  for (int o = 0; o < n_obs; ++o) {
    const double* row = obstacles + o * 10;
    obs[o].c[0] = row[0]; obs[o].c[1] = row[1]; obs[o].c[2] = row[2];
    quat_to_rot(row + 3, obs[o].r);
    obs[o].h[0] = row[7] / 2; obs[o].h[1] = row[8] / 2; obs[o].h[2] = row[9] / 2;
  }

  int result = 1;
  double q[kNumJoints];
  // check the first waypoint, then substeps per segment
  if (config_in_collision(traj, obs, n_obs)) {
    if (first_bad_segment) *first_bad_segment = 0;
    result = 0;
  } else {
    for (int s = 0; s + 1 < n_waypoints && result; ++s) {
      const double* qa = traj + s * kNumJoints;
      const double* qb = traj + (s + 1) * kNumJoints;
      for (int k = 1; k <= substeps; ++k) {
        const double u = static_cast<double>(k) / substeps;
        for (int j = 0; j < kNumJoints; ++j) q[j] = qa[j] + u * (qb[j] - qa[j]);
        if (config_in_collision(q, obs, n_obs)) {
          if (first_bad_segment) *first_bad_segment = s;
          result = 0;
          break;
        }
      }
    }
  }
  delete[] obs;
  return result;
}

// Batch version: results[i] = 1/0 per trajectory, returns count of successes.
int edmp_validate_batch(const double* trajs, int n_trajs, int n_waypoints,
                        const double* obstacles, int n_obs, int substeps,
                        int* results) {
  int successes = 0;
  for (int i = 0; i < n_trajs; ++i) {
    int bad = -1;
    const int ok = edmp_validate_trajectory(
        trajs + i * n_waypoints * kNumJoints, n_waypoints, obstacles, n_obs,
        substeps, &bad);
    results[i] = ok == 1 ? 1 : 0;
    successes += results[i];
  }
  return successes;
}

// Single-config collision query (for tests/debug).
int edmp_config_in_collision(const double* q, const double* obstacles,
                             int n_obs) {
  if (!g_ready) return -2;
  Obb* obs = new Obb[n_obs > 0 ? n_obs : 1];
  for (int o = 0; o < n_obs; ++o) {
    const double* row = obstacles + o * 10;
    obs[o].c[0] = row[0]; obs[o].c[1] = row[1]; obs[o].c[2] = row[2];
    quat_to_rot(row + 3, obs[o].r);
    obs[o].h[0] = row[7] / 2; obs[o].h[1] = row[8] / 2; obs[o].h[2] = row[9] / 2;
  }
  const bool hit = config_in_collision(q, obs, n_obs);
  delete[] obs;
  return hit ? 1 : 0;
}

}  // extern "C"
