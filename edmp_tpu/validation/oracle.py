"""Python bindings for the native validation oracle (+ numpy reference).

``TrajectoryOracle`` compiles ``csrc/oracle.cc`` on first use (g++ -O3,
cached next to the source) and exposes the reference's success semantics
(lib/environment.py:632-680: any robot-obstacle contact along the executed
trajectory => failure) as a deterministic geometric check.

``python_validate_trajectory`` is an independent numpy implementation of the
same check (vertex-projection SAT) used to cross-validate the C++ core.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from edmp_tpu import constants as C

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "oracle.cc")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "liboracle.so")
_BUILD_LOCK = threading.Lock()


def _build_library() -> str:
    with _BUILD_LOCK:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _LIB],
                check=True, capture_output=True)
    return _LIB


class TrajectoryOracle:
    """Native success oracle: collision-free <=> success."""

    def __init__(self, substeps: int = 8):
        self.substeps = int(substeps)
        self._lib = ctypes.CDLL(_build_library())
        self._lib.edmp_set_robot.argtypes = [ctypes.c_void_p] * 4
        self._lib.edmp_validate_trajectory.restype = ctypes.c_int
        self._lib.edmp_validate_batch.restype = ctypes.c_int
        self._lib.edmp_config_in_collision.restype = ctypes.c_int

        dh = np.ascontiguousarray(C.DH_PARAMS, np.float64)
        frames = np.ascontiguousarray(C.LINK_STATIC_FRAMES.reshape(9, 16),
                                      np.float64)
        half = np.ascontiguousarray(C.LINK_BOX_DIMS / 2.0, np.float64)
        lj = np.ascontiguousarray(C.LINK_JOINT_FRAME, np.int32)
        self._keep = (dh, frames, half, lj)  # keep buffers alive
        self._lib.edmp_set_robot(
            dh.ctypes.data, frames.ctypes.data, half.ctypes.data,
            lj.ctypes.data)

    def validate(self, trajectory: np.ndarray,
                 obstacle_config: np.ndarray) -> tuple[bool, int]:
        """trajectory (N, 7); obstacle_config (n, 10).

        Returns (success, first_bad_segment or -1)."""
        traj = np.ascontiguousarray(trajectory, np.float64)
        if traj.ndim != 2 or traj.shape[1] != 7:
            raise ValueError(f"trajectory must be (N, 7), got {traj.shape}")
        obs = np.ascontiguousarray(
            np.asarray(obstacle_config, np.float64).reshape(-1, 10))
        bad = ctypes.c_int(-1)
        ok = self._lib.edmp_validate_trajectory(
            ctypes.c_void_p(traj.ctypes.data), ctypes.c_int(traj.shape[0]),
            ctypes.c_void_p(obs.ctypes.data), ctypes.c_int(obs.shape[0]),
            ctypes.c_int(self.substeps), ctypes.byref(bad))
        if ok == -2:
            raise RuntimeError("oracle robot geometry not initialised")
        return bool(ok), int(bad.value)

    def validate_batch(self, trajectories: np.ndarray,
                       obstacle_config: np.ndarray) -> np.ndarray:
        """trajectories (B, N, 7) -> bool (B,)."""
        trajs = np.ascontiguousarray(trajectories, np.float64)
        B, N, _ = trajs.shape
        obs = np.ascontiguousarray(
            np.asarray(obstacle_config, np.float64).reshape(-1, 10))
        results = np.zeros(B, np.int32)
        self._lib.edmp_validate_batch(
            ctypes.c_void_p(trajs.ctypes.data), ctypes.c_int(B),
            ctypes.c_int(N),
            ctypes.c_void_p(obs.ctypes.data), ctypes.c_int(obs.shape[0]),
            ctypes.c_int(self.substeps),
            ctypes.c_void_p(results.ctypes.data))
        return results.astype(bool)

    def config_in_collision(self, q: np.ndarray,
                            obstacle_config: np.ndarray) -> bool:
        qq = np.ascontiguousarray(q, np.float64).reshape(7)
        obs = np.ascontiguousarray(
            np.asarray(obstacle_config, np.float64).reshape(-1, 10))
        return bool(self._lib.edmp_config_in_collision(
            ctypes.c_void_p(qq.ctypes.data),
            ctypes.c_void_p(obs.ctypes.data), ctypes.c_int(obs.shape[0])))


# ---------------------------------------------------------------------------
# Independent numpy implementation (test cross-check)
# ---------------------------------------------------------------------------

_CORNERS = np.stack(np.meshgrid(*[[-1.0, 1.0]] * 3, indexing="ij"),
                    -1).reshape(8, 3)


def _quat_to_rot(q):
    from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix

    return _quat_xyzw_to_matrix(np.asarray(q))


def _link_obbs(q):
    from edmp_tpu.robot.kinematics import link_box_frames

    import jax.numpy as jnp

    R, p = link_box_frames(jnp.asarray(q, jnp.float32)[None])
    return np.asarray(R)[0], np.asarray(p)[0]


def _obbs_overlap(Ra, pa, ha, Rb, pb, hb) -> bool:
    """Vertex-projection SAT (intentionally a different formulation from the
    C++ radius form)."""
    va = (Ra @ (_CORNERS * ha).T).T + pa
    vb = (Rb @ (_CORNERS * hb).T).T + pb
    axes = [Ra[:, i] for i in range(3)] + [Rb[:, i] for i in range(3)]
    for i in range(3):
        for j in range(3):
            c = np.cross(Ra[:, i], Rb[:, j])
            n = np.linalg.norm(c)
            if n > 1e-9:
                axes.append(c / n)
    for ax in axes:
        pa_ = va @ ax
        pb_ = vb @ ax
        if pa_.max() < pb_.min() - 1e-12 or pb_.max() < pa_.min() - 1e-12:
            return False
    return True


def python_config_in_collision(q, obstacle_config) -> bool:
    obs = np.asarray(obstacle_config, np.float64).reshape(-1, 10)
    Rl, pl = _link_obbs(q)
    hl = C.LINK_BOX_DIMS / 2.0
    for o in range(obs.shape[0]):
        Ro = _quat_to_rot(obs[o, 3:7])
        for l in range(9):
            if _obbs_overlap(Rl[l], pl[l], hl[l], Ro, obs[o, :3],
                             obs[o, 7:] / 2.0):
                return True
    return False


def python_validate_trajectory(trajectory, obstacle_config,
                               substeps: int = 8) -> bool:
    traj = np.asarray(trajectory, np.float64)
    if python_config_in_collision(traj[0], obstacle_config):
        return False
    for s in range(traj.shape[0] - 1):
        for k in range(1, substeps + 1):
            u = k / substeps
            q = traj[s] + u * (traj[s + 1] - traj[s])
            if python_config_in_collision(q, obstacle_config):
                return False
    return True
