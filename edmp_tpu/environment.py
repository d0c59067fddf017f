"""Drop-in execution-environment facade (RobotEnvironment parity).

Mirrors the API surface of the reference's PyBullet wrapper
(``lib/environment.py``: clear_obstacles / spawn_collision_* / go_home /
benchmark_trajectory / FK / jacobian / IK helpers) on top of the native
oracle and the JAX kinematics — no physics process, no GUI, deterministic.
Trajectories use the reference's (7, N) channel-first layout at this
boundary.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.validation.oracle import TrajectoryOracle


class PlanningEnvironment:
    def __init__(self, gui: bool = False, substeps: int = 8):
        # gui accepted for signature parity (environment.py:17); ignored.
        del gui
        self.oracle = TrajectoryOracle(substeps=substeps)
        self._obstacles: List[np.ndarray] = []
        self.joint_lower_limits = C.JOINT_LIMITS_LOWER.copy()
        self.joint_upper_limits = C.JOINT_LIMITS_UPPER.copy()
        self.current_joints = np.zeros(7)

    # -- obstacle management (environment.py:230-274) ----------------------
    @property
    def obstacle_config(self) -> np.ndarray:
        if not self._obstacles:
            return np.zeros((0, 10))
        return np.concatenate(self._obstacles, axis=0)

    def spawn_collision_cuboids(self, cuboid_config) -> None:
        cfg = np.asarray(cuboid_config, np.float64).reshape(-1, 10)
        if cfg.size:
            self._obstacles.append(cfg)

    def spawn_collision_cylinders(self, cylinder_config) -> None:
        """(n, 9) rows [center, quat_xyzw, radius, height] -> boxed with dims
        (r, r, h) exactly like the cost engine sees them
        (load_test_dataset.py:136-139)."""
        cfg = np.asarray(cylinder_config, np.float64).reshape(-1, 9)
        if cfg.size:
            boxed = np.concatenate(
                [cfg[:, :7], cfg[:, 7:8], cfg[:, 7:8], cfg[:, 8:9]], axis=1)
            self._obstacles.append(boxed)

    def clear_obstacles(self) -> None:
        self._obstacles.clear()

    # -- robot state (environment.py:339-345,586-589) ----------------------
    def go_home(self) -> None:
        self.current_joints = np.zeros(7)

    def get_joint_positions(self) -> np.ndarray:
        return self.current_joints.copy()

    # -- kinematics helpers (environment.py:347-446) ------------------------
    def forward_kinematics(self, joint_angles) -> np.ndarray:
        from edmp_tpu.robot.kinematics import numpy_ee_transform

        return numpy_ee_transform(np.asarray(joint_angles, np.float64))

    def get_jacobian(self, joint_angles) -> np.ndarray:
        """6x7 geometric jacobian of the EE frame via jax.jacfwd."""
        import jax
        import jax.numpy as jnp

        from edmp_tpu.robot.kinematics import ee_transform

        q = jnp.asarray(joint_angles, jnp.float32)

        def posrot(q):
            T = ee_transform(q)
            return T[:3, 3], T[:3, :3]

        Jp = jax.jacfwd(lambda q: posrot(q)[0])(q)          # (3, 7)
        JR = jax.jacfwd(lambda q: posrot(q)[1])(q)          # (3, 3, 7)
        R = np.asarray(posrot(q)[1])
        # angular velocity columns: vee(dR/dq_i @ R^T)
        Jw = np.zeros((3, 7))
        JRn = np.asarray(JR)
        for i in range(7):
            W = JRn[:, :, i] @ R.T
            Jw[:, i] = [W[2, 1], W[0, 2], W[1, 0]]
        return np.concatenate([np.asarray(Jp), Jw], axis=0)

    def inverse_kinematics(self, target_pose, q_init: Optional[np.ndarray] = None):
        from edmp_tpu.robot.ik import numerical_ik

        q0 = np.zeros(7) if q_init is None else np.asarray(q_init)
        q, err = numerical_ik(np.asarray(target_pose, np.float64), q0)
        return np.asarray(q), float(err)

    def clip_joints(self, joints) -> np.ndarray:
        return np.clip(np.asarray(joints), self.joint_lower_limits,
                       self.joint_upper_limits)

    # -- collision / success oracle (environment.py:591-680) ----------------
    def check_collisions(self, joint_angles=None) -> bool:
        q = self.current_joints if joint_angles is None else joint_angles
        return self.oracle.config_in_collision(np.asarray(q),
                                               self.obstacle_config)

    def execute_trajectory(self, trajectory) -> bool:
        return bool(self.benchmark_trajectory(trajectory))

    def benchmark_trajectory(self, trajectory) -> int:
        """trajectory (7, N) reference layout; returns 1 on success
        (collision-free execution), 0 otherwise (environment.py:632-680)."""
        traj = np.asarray(trajectory, np.float64)
        if traj.shape[0] == 7 and traj.shape[1] != 7:
            traj = traj.T
        ok, _ = self.oracle.validate(traj, self.obstacle_config)
        self.current_joints = traj[-1]
        return int(ok)
