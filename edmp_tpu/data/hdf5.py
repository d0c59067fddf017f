"""MPiNets HDF5 training-data ingestion.

The reference trains on the MPiNets ``train.hdf5`` ("3M + 3M" global+hybrid
expert trajectories, training.py:24,51) and reads scenes via
``get_mpinet_scene`` (lib/environment.py:133-199).  Key layout (per index):
``{global,hybrid}_solutions`` (N, 7) trajectories; ``cuboid_*`` /
``cylinder_*`` arrays zero-padded, true counts found by the first all-zero
row.  Quaternions are stored wxyz and rolled to xyzw.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

SOLUTION_KEYS = ("hybrid_solutions", "global_solutions")


class TrajectoryDataset:
    """Streaming batches of expert trajectories for denoiser training."""

    def __init__(self, path: str, solution_key: Optional[str] = None):
        import h5py

        self._f = h5py.File(path, "r")
        if solution_key is None:
            for k in SOLUTION_KEYS:
                if k in self._f:
                    solution_key = k
                    break
            else:
                raise KeyError(
                    f"none of {SOLUTION_KEYS} present in {path}: "
                    f"{list(self._f.keys())}")
        self.key = solution_key
        self._data = self._f[self.key]
        self.num_trajectories = self._data.shape[0]
        self.traj_len = self._data.shape[1]

    def batches(self, batch_size: int, rng: np.random.Generator,
                num_batches: Optional[int] = None) -> Iterator[np.ndarray]:
        """Yield (B, N, 7) float32 batches, sampled with replacement (the
        reference's generate_training_batch semantics)."""
        produced = 0
        while num_batches is None or produced < num_batches:
            idx = np.sort(rng.integers(0, self.num_trajectories, batch_size))
            # h5py requires increasing unique indices for fancy selection
            uniq, inverse = np.unique(idx, return_inverse=True)
            batch = self._data[uniq][inverse]
            yield np.asarray(batch, np.float32)
            produced += 1

    def scene(self, index: int):
        """Extract the scene of one training problem as a packed Problem
        (get_mpinet_scene equivalent, lib/environment.py:133-199)."""
        import jax.numpy as jnp

        from edmp_tpu.data.problems import Problem
        from edmp_tpu.robot.kinematics import ee_transform

        f = self._f
        cc = np.asarray(f["cuboid_centers"][index])
        cd = np.asarray(f["cuboid_dims"][index])
        cq = np.roll(np.asarray(f["cuboid_quaternions"][index]), -1, axis=1)
        yc = np.asarray(f["cylinder_centers"][index])
        yh = np.asarray(f["cylinder_heights"][index])
        yq = np.roll(np.asarray(f["cylinder_quaternions"][index]), -1, axis=1)
        yr = np.asarray(f["cylinder_radii"][index])

        ncu = int(np.argmax(np.any(cd == 0, axis=1)))
        ncy = int(np.argmax(np.any(yh == 0, axis=1)))
        cuboid = np.concatenate([cc[:ncu], cq[:ncu], cd[:ncu]], axis=1)
        cylinder = np.concatenate([yc[:ncy], yq[:ncy], yr[:ncy], yh[:ncy]],
                                  axis=1)
        boxed = np.concatenate(
            [yc[:ncy], yq[:ncy], yr[:ncy], yr[:ncy], yh[:ncy]], axis=1)
        obstacle = (np.concatenate([cuboid, boxed], axis=0)
                    if ncy else cuboid)

        traj = np.asarray(self._data[index])
        target = np.asarray(
            ee_transform(jnp.asarray(traj[-1], jnp.float32)), np.float64)
        return Problem(target_pose=target, q0=traj[0].astype(np.float64),
                       obstacle_config=obstacle, cuboid_config=cuboid,
                       cylinder_config=cylinder)

    def close(self):
        self._f.close()
