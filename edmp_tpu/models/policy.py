"""MPiNets motion-policy baseline (L11), TPU-native.

Counterpart of the reference's ``mpinets/model.py`` (MotionPolicyNetwork /
TrainingMotionPolicyNetwork) and ``mpinets/loss.py`` — the one layer SURVEY.md
§1 lists with "no in-repo caller".  Re-designed for TPU:

  * the PointNet++ encoder rides ``models/pointnet.py`` (JAX FPS/ball-query
    replacing the pointnet2 CUDA ops);
  * robot surface clouds come from the jittable box-surface sampler
    (``robot/point_sampler.py``) instead of robofin mesh sampling;
  * the closed-loop rollout (mpinets/model.py:128-183) is a ``lax.scan`` so a
    70-step episode is ONE device program;
  * losses (mpinets/loss.py:31-94) use the batched exact SDFs from
    ``costs/sdf.py`` with zero-volume masking.

Quaternions in training batches are wxyz, matching the reference's batch
schema (mpinets/loss.py:69-73).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from edmp_tpu.costs import sdf as S
from edmp_tpu.models.pointnet import MPiNetsPointNet
from edmp_tpu.robot.kinematics import ee_transform
from edmp_tpu.robot.normalize import unnormalize_joints
from edmp_tpu.robot.point_sampler import (CollisionSphereSampler,
                                          RobotPointSampler)


class MotionPolicyNetwork(nn.Module):
    """Point-cloud + configuration -> normalized joint displacement.

    Topology parity: mpinets/model.py:41-91 (feature encoder
    7->32->64->128->128->64 LeakyReLU, decoder 2048+64->512->256->128->7).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """xyz (B, N, 4) segmented cloud; q (B, 7) normalized configuration."""
        pc = MPiNetsPointNet(dtype=self.dtype, name="point_cloud_encoder")(xyz)
        x = q
        for width in (32, 64, 128, 128):
            x = nn.leaky_relu(nn.Dense(width, dtype=self.dtype)(x))
        feat = nn.Dense(64, dtype=self.dtype)(x)
        x = jnp.concatenate([pc, feat], axis=-1)
        for width in (512, 256, 128):
            x = nn.leaky_relu(nn.Dense(width, dtype=self.dtype)(x))
        return nn.Dense(7, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Losses (mpinets/loss.py)
# ---------------------------------------------------------------------------


def point_match_loss(input_pc: jnp.ndarray,
                     target_pc: jnp.ndarray) -> jnp.ndarray:
    """MSE + L1 between same-layout point clouds (mpinets/loss.py:31-44)."""
    diff = input_pc - target_pc
    return jnp.mean(diff * diff) + jnp.mean(jnp.abs(diff))


def _quat_wxyz_to_xyzw(q):
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def _quat_rotmats(q_xyzw):
    """Traced (..., 4) xyzw -> (..., 3, 3) rotation matrices."""
    q = q_xyzw / jnp.maximum(
        jnp.linalg.norm(q_xyzw, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], axis=-1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], axis=-1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def scene_primitives(batch: Dict[str, jnp.ndarray]
                     ) -> Tuple[S.Cuboids, S.Cylinders]:
    """Batched SDF primitive structs from a training-batch dict (wxyz quats,
    mpinets/loss.py:47-94 schema: cuboid_{centers,dims,quats},
    cylinder_{centers,radii,heights,quats})."""
    cub = S.Cuboids(
        centers=batch["cuboid_centers"],
        inv_rot=jnp.swapaxes(
            _quat_rotmats(_quat_wxyz_to_xyzw(batch["cuboid_quats"])), -1, -2),
        half=batch["cuboid_dims"] / 2.0,
    )
    cyl = S.Cylinders(
        centers=batch["cylinder_centers"],
        inv_rot=jnp.swapaxes(
            _quat_rotmats(_quat_wxyz_to_xyzw(batch["cylinder_quats"])), -1,
            -2),
        radii=batch["cylinder_radii"][..., 0],
        half_h=batch["cylinder_heights"][..., 0] / 2.0,
    )
    return cub, cyl


def collision_loss(input_pc: jnp.ndarray, cuboids: S.Cuboids,
                   cylinders: S.Cylinders, margin: float = 0.03
                   ) -> jnp.ndarray:
    """Mean hinge on the scene SDF of robot surface points — within 3 cm of
    (or inside) any obstacle is penalized (mpinets/loss.py:47-94; the
    hinge_embedding_loss(margin=0.03, mean) formulation).

    input_pc (B, N, 3); primitives carry a leading batch axis.
    """
    sd = jax.vmap(lambda pc, cub, cyl: jnp.minimum(cub.sdf(pc), cyl.sdf(pc)))(
        input_pc, cuboids, cylinders)
    return jnp.mean(jnp.maximum(margin - sd, 0.0))


class PolicyLosses(NamedTuple):
    collision: jnp.ndarray
    point_match: jnp.ndarray


def make_loss_fn(model: MotionPolicyNetwork, num_points: int = 1024,
                 seed: int = 0):
    """Loss closure with a cached fixed-point robot sampler — the
    CollisionAndBCLossContainer role (mpinets/loss.py:97-166)."""
    sampler = RobotPointSampler(num_points, seed)

    def losses(params, batch: Dict[str, jnp.ndarray]) -> PolicyLosses:
        xyz, q = batch["xyz"], batch["configuration"]
        delta = model.apply({"params": params}, xyz, q)
        y_hat = jnp.clip(q + delta, -1.0, 1.0)     # mpinets/model.py:202
        input_pc = sampler(unnormalize_joints(y_hat))
        target_pc = sampler(unnormalize_joints(batch["supervision"]))
        cub, cyl = scene_primitives(batch)
        return PolicyLosses(
            collision=collision_loss(input_pc, cub, cyl),
            point_match=point_match_loss(input_pc, target_pc),
        )

    return losses


# ---------------------------------------------------------------------------
# Training / rollout / validation (mpinets/model.py:94-352)
# ---------------------------------------------------------------------------


class PolicyTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_policy(rng, num_points: int = 2048, model: MotionPolicyNetwork
                | None = None):
    model = model or MotionPolicyNetwork()
    xyz = jnp.zeros((1, num_points, 4), jnp.float32)
    q = jnp.zeros((1, 7), jnp.float32)
    params = model.init(rng, xyz, q)["params"]
    return model, params


def make_train_step(model: MotionPolicyNetwork,
                    point_match_loss_weight: float = 1.0,
                    collision_loss_weight: float = 5.0,
                    num_robot_points: int = 1024,
                    learning_rate: float = 1e-4):
    """Jittable Adam training step (mpinets/model.py:68-73,185-240).

    Loss weights are construction arguments in the reference
    (TrainingMotionPolicyNetwork.__init__); defaults here are free choices —
    the reference repo never instantiates the trainer.
    """
    tx = optax.adam(learning_rate)
    losses_of = make_loss_fn(model, num_robot_points)

    def init_state(params) -> PolicyTrainState:
        return PolicyTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def train_step(state: PolicyTrainState, batch):
        def weighted(params):
            parts = losses_of(params, batch)
            total = (point_match_loss_weight * parts.point_match
                     + collision_loss_weight * parts.collision)
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            weighted, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PolicyTrainState(params, opt_state, state.step + 1), {
            "val_loss": total,
            "point_match_loss": parts.point_match,
            "collision_loss": parts.collision,
        }

    return init_state, train_step


def make_rollout_fn(model: MotionPolicyNetwork, num_robot_points: int = 1024,
                    seed: int = 0):
    """Closed-loop policy rollout as one ``lax.scan``
    (mpinets/model.py:128-183).

    Returns roll(params, xyz, q, length) -> (length+1, B, 7) NORMALIZED
    trajectory (the reference's unnormalize flag is a post-processing concern:
    apply ``unnormalize_joints`` to the result).  ``xyz`` is (B, N, 4) with
    the first ``num_robot_points`` rows being the robot cloud, which is
    resampled at each new configuration (mpinets/model.py:180-181).
    """
    sampler = RobotPointSampler(num_robot_points, seed)

    def roll(params, xyz, q, length: int):
        def step(carry, _):
            xyz, q = carry
            q = jnp.clip(q + model.apply({"params": params}, xyz, q),
                         -1.0, 1.0)
            samples = sampler(unnormalize_joints(q))
            xyz = xyz.at[:, :num_robot_points, :3].set(samples)
            return (xyz, q), q

        (_, _), traj = jax.lax.scan(step, (xyz, q), None, length=length)
        return jnp.concatenate([q[None], traj], axis=0)

    return roll


def make_validate_fn(model: MotionPolicyNetwork, rollout_length: int = 69,
                     num_robot_points: int = 1024, spheres_per_link: int = 4):
    """Build-once, jitted rollout validation (mpinets/model.py:252-318).

    Returns ``validate(params, batch) -> {avg_target_error,
    avg_collision_rate}``.  Built OUTSIDE training loops so the 69-step scan
    traces once instead of per call (it also produces rollouts for the
    policy-vs-diffusion head-to-head, tools/policy_eval.py).
    """
    roll = make_rollout_fn(model, num_robot_points)
    spheres = CollisionSphereSampler(spheres_per_link)

    def validate(params, batch):
        traj_norm = roll(params, batch["xyz"], batch["configuration"],
                         rollout_length)                   # (L+1, B, 7)
        traj = unnormalize_joints(jnp.swapaxes(traj_norm, 0, 1))  # (B,L+1,7)

        eff = ee_transform(traj[:, -1])
        pos_err = jnp.linalg.norm(eff[..., :3, 3] - batch["target_position"],
                                  axis=-1)

        centers = spheres(traj)                            # (B, L+1, M, 3)
        cub, cyl = scene_primitives(batch)
        sd = jax.vmap(lambda c, u, y: jnp.minimum(u.sdf_all(c).min(-1),
                                                  y.sdf_all(c).min(-1)))(
            centers, cub, cyl)                             # (B, L+1, M)
        hit = jnp.any(sd <= spheres.radii, axis=(-1, -2))
        return {
            "avg_target_error": jnp.mean(pos_err),
            "avg_collision_rate": jnp.mean(hit.astype(jnp.float32)),
        }

    return jax.jit(validate)


def validate_policy(model: MotionPolicyNetwork, params, batch,
                    rollout_length: int = 69, num_robot_points: int = 1024,
                    spheres_per_link: int = 4) -> Dict[str, jnp.ndarray]:
    """One-shot convenience wrapper over :func:`make_validate_fn` (loops
    should build the fn once instead)."""
    return make_validate_fn(model, rollout_length, num_robot_points,
                            spheres_per_link)(params, batch)


def save_policy_params(params, path: str) -> None:
    """Persist policy params as a flat keystr-keyed npz (the
    cli.train_policy checkpoint format)."""
    import numpy as np

    flat = {jax.tree_util.keystr(p): np.asarray(leaf)
            for p, leaf in jax.tree_util.tree_leaves_with_path(params)}
    np.savez(path, **flat)


def load_policy_params(path: str, num_points: int = 2048):
    """Load a cli.train_policy checkpoint back into the params pytree.

    The npz keys are ``jax.tree_util.keystr`` paths; the tree structure
    comes from a fresh ``init_policy`` template (shape-checked leaf by
    leaf).  Round-trip test: tests/test_policy.py."""
    import numpy as np

    flat = dict(np.load(path))
    _, template = init_policy(jax.random.key(0), num_points=num_points)

    def pick(p, leaf):
        k = jax.tree_util.keystr(p)
        if k not in flat:
            raise KeyError(f"checkpoint missing parameter {k}")
        arr = jnp.asarray(flat[k])
        if arr.shape != leaf.shape:
            raise ValueError(f"{k}: checkpoint shape {arr.shape} != model "
                             f"shape {leaf.shape}")
        return arr
    return jax.tree_util.tree_map_with_path(pick, template)
