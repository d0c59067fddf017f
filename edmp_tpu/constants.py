"""Physical constants for the Franka Panda arm and the EDMP planning problem.

All robot-geometry constants are vendored here as plain numpy arrays so that no
mesh/URDF parsing happens at runtime (the reference parses pybullet_data collision
meshes at startup, ``/root/reference/lib/guide.py:243-284``; we freeze the results).

Sources (reference file:line, for parity auditing):
  * DH table (10 rows, modified-DH):        lib/guide.py:29-38
  * 9 static link frames (joint->box):      lib/guide.py:289-342
  * link -> joint frame assignment:         lib/guide.py:286
  * finger y-extent x4 widening:            lib/guide.py:278-279
  * sampler clip limits (degrees):          diffusion/diffusion.py:282-296
  * q7 sampling range for IK seeds:         datasets/load_test_dataset.py:176
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Modified-DH parameters: rows are (a, d, alpha, theta_offset).
# Rows 0..6 take the 7 joint angles as theta; rows 7..9 are the static
# flange (d=0.107), the -45deg wrist rotation, and the gripper TCP (d=0.1034).
# ---------------------------------------------------------------------------
DH_PARAMS = np.array(
    [
        [0.0, 0.333, 0.0, 0.0],
        [0.0, 0.0, -np.pi / 2, 0.0],
        [0.0, 0.316, np.pi / 2, 0.0],
        [0.0825, 0.0, np.pi / 2, 0.0],
        [-0.0825, 0.384, -np.pi / 2, 0.0],
        [0.0, 0.0, np.pi / 2, 0.0],
        [0.088, 0.0, np.pi / 2, 0.0],
        [0.0, 0.107, 0.0, 0.0],
        [0.0, 0.0, 0.0, -np.pi / 4],
        [0.0, 0.1034, 0.0, 0.0],
    ],
    dtype=np.float64,
)

NUM_JOINTS = 7
NUM_LINKS = 9  # 7 arm links + hand + finger (boxes attached to joint frames)
NUM_DH_FRAMES = 10

# Which joint frame each of the 9 collision boxes is attached to
# (1-indexed joint; hand and finger ride on joint 7).  lib/guide.py:286
LINK_JOINT_FRAME = np.array([1, 2, 3, 4, 5, 6, 7, 7, 7], dtype=np.int32)

# ---------------------------------------------------------------------------
# Static transforms from each joint frame to the center of that link's
# axis-aligned collision box (in the joint frame).  lib/guide.py:289-342
# ---------------------------------------------------------------------------
_SQ2 = 7.07106767e-01
_SQ2B = 7.07106795e-01
LINK_STATIC_FRAMES = np.array(
    [
        [[1, 0, 0, 8.71e-05], [0, 1, 0, -3.709035e-02], [0, 0, 1, -6.851545e-02], [0, 0, 0, 1]],
        [[1, 0, 0, -8.425e-05], [0, 1, 0, -6.93950016e-02], [0, 0, 1, 3.71961970e-02], [0, 0, 0, 1]],
        [[1, 0, 0, 0.0414576], [0, 1, 0, 0.0281429], [0, 0, 1, -0.03293086], [0, 0, 0, 1]],
        [[1, 0, 0, -4.12337575e-02], [0, 1, 0, 3.44296512e-02], [0, 0, 1, 2.79226985e-02], [0, 0, 0, 1]],
        [[1, 0, 0, 3.3450000e-05], [0, 1, 0, 3.7388050e-02], [0, 0, 1, -1.0619285e-01], [0, 0, 0, 1]],
        [[1, 0, 0, 4.21935000e-02], [0, 1, 0, 1.52195003e-02], [0, 0, 1, 6.07699933e-03], [0, 0, 0, 1]],
        [[1, 0, 0, 1.86357500e-02], [0, 1, 0, 1.85788569e-02], [0, 0, 1, 7.94137484e-02], [0, 0, 0, 1]],
        [[_SQ2, _SQ2B, 0, -1.26717073e-03], [-_SQ2B, _SQ2, 0, -1.25294673e-03], [0, 0, 1, 1.27018693e-01], [0, 0, 0, 1]],
        [[_SQ2, _SQ2B, 0, 9.29352476e-03], [-_SQ2B, _SQ2, 0, 9.28272434e-03], [0, 0, 1, 1.92390375e-01], [0, 0, 0, 1]],
    ],
    dtype=np.float64,
)

# ---------------------------------------------------------------------------
# Collision-box extents (x, y, z) of each link, meters.
#
# The reference derives these at startup as the AABB extents of the
# pybullet_data franka_panda collision meshes (lib/guide.py:245-282), with the
# finger y-extent widened x4 (already applied below).  pybullet_data is not
# available in this environment, so the values below are vendored
# approximations of those mesh AABBs; regenerate exact values with
# ``tools/extract_link_boxes.py`` on a machine with pybullet_data installed.
# ---------------------------------------------------------------------------
LINK_BOX_DIMS = np.array(
    [
        [0.145, 0.170, 0.283],  # link1
        [0.145, 0.283, 0.170],  # link2
        [0.155, 0.160, 0.230],  # link3
        [0.160, 0.150, 0.230],  # link4
        [0.125, 0.145, 0.325],  # link5
        [0.130, 0.135, 0.100],  # link6
        [0.090, 0.090, 0.120],  # link7
        [0.205, 0.085, 0.125],  # hand
        [0.022, 0.088, 0.055],  # finger (y already x4)
    ],
    dtype=np.float64,
)

# Sensitivity-study override (tools/link_dims_sensitivity.py): scale the
# vendored box dims at import time.  EDMP_LINK_DIMS_SCALE is either one
# float (global) or 9 comma-separated per-link factors.  Test-only — the
# vendored values above are the shipped model.
import os as _os

_scale_env = _os.environ.get("EDMP_LINK_DIMS_SCALE")
if _scale_env:
    _factors = np.asarray([float(x) for x in _scale_env.split(",")],
                          np.float64)
    if _factors.size == 1:
        LINK_BOX_DIMS = LINK_BOX_DIMS * _factors[0]
    elif _factors.size == 9:
        LINK_BOX_DIMS = LINK_BOX_DIMS * _factors[:, None]
    else:
        raise ValueError("EDMP_LINK_DIMS_SCALE needs 1 or 9 factors")

# ---------------------------------------------------------------------------
# Joint limits.  The sampler's clip limits (diffusion/diffusion.py:282-296)
# are expressed in degrees there; they coincide with the physical Franka
# limits to 3 decimals.  We keep both representations.
# ---------------------------------------------------------------------------
JOINT_LIMITS_LOWER = np.array(
    [-166, -101, -166, -176, -166, -1, -166], dtype=np.float64
) * (np.pi / 180.0)
JOINT_LIMITS_UPPER = np.array(
    [166, 101, 166, -4, 166, 215, 166], dtype=np.float64
) * (np.pi / 180.0)

# Physical limits used for IK solution validity (robofin convention).
FRANKA_LOWER = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973], dtype=np.float64
)
FRANKA_UPPER = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973], dtype=np.float64
)

# q7 seed range used in the IK goal sweep (datasets/load_test_dataset.py:176).
Q7_RANGE = 2.8973

# ---------------------------------------------------------------------------
# Problem-shape defaults (benchmark/cfgs/cfg1.yaml).
# ---------------------------------------------------------------------------
DEFAULT_TRAJ_LEN = 50
DEFAULT_T = 255
DEFAULT_NUM_CHANNELS = 7
DEFAULT_UNET_DIMS = (32, 64, 128, 256, 512, 512)
DEFAULT_TIME_DIM = 32

# Obstacle padding: fixed MAX_OBSTACLES with phantom obstacles placed far away
# (so padded entries can never overlap the workspace even after expansion).
MAX_OBSTACLES = 24
PHANTOM_OBSTACLE_CENTER = 1.0e4
