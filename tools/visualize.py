"""Headless scene/trajectory visualizer (PNG), replacing the reference's
PyBullet GUI debug layer.

The reference validated its FK/box model visually: drawing link bounding
boxes against the live robot (lib/environment.py:280-337), spawning
visual-only geometry (:201-228), and stepping trajectories interactively
(:610-630).  On a TPU host there is no GUI; this tool renders the same
information headlessly:

  panel 1  3D scene: obstacle OBBs, link boxes at sampled waypoints, the
           end-effector path (best sample solid, rejected samples faint)
  panel 2  self-collision clearance heatmap (waypoint x capsule pair;
           red = interpenetration) — the round-3 dominant failure mode
           made directly visible
  panel 3  joint traces vs the sampler limits (limit violations visible)

Input modes:
  --npz FILE            arrays: obstacle_config (n,10/11), trajectory (N,7),
                        optional rejected (K,N,7)
  --replan              plan one scene of the synthetic protocol corpus
                        (same generator/seed as tools/assist_study.py) on
                        the current backend, then render; --assist-sc/jl
                        enable the assist terms for before/after renders

Example (the committed docs/viz_* renders):
  python -m tools.visualize --replan --scene-index 3 --out docs/viz_base.png
  python -m tools.visualize --replan --scene-index 3 --assist-sc 5 \
      --assist-jl 1 --out docs/viz_assist.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def _quat_to_rot(q):
    """xyzw quaternion -> 3x3 rotation (same convention as costs/obstacles)."""
    x, y, z, w = q
    n = max(np.sqrt(x * x + y * y + z * z + w * w), 1e-12)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _box_faces(center, R, dims):
    """8 corners -> 6 quad faces of an oriented box."""
    h = np.asarray(dims) / 2.0
    corners = np.array([[sx * h[0], sy * h[1], sz * h[2]]
                        for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)])
    world = corners @ R.T + np.asarray(center)
    idx = [[0, 1, 3, 2], [4, 5, 7, 6], [0, 1, 5, 4],
           [2, 3, 7, 6], [0, 2, 6, 4], [1, 3, 7, 5]]
    return [world[i] for i in idx]


def _add_box(ax, center, R, dims, color, alpha):
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    pc = Poly3DCollection(_box_faces(center, R, dims), alpha=alpha,
                          facecolor=color, edgecolor="k", linewidths=0.3)
    ax.add_collection3d(pc)


def render(obstacle_config, trajectory, rejected=None, out="viz.png",
           title=None, n_robot_poses=6):
    """Render the 3-panel debug figure to ``out`` (PNG)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from edmp_tpu import constants as C
    from edmp_tpu.robot.kinematics import link_box_frames, numpy_ee_transform
    from edmp_tpu.robot.self_collision import SELF_PAIRS, min_pair_clearance

    import jax.numpy as jnp

    traj = np.asarray(trajectory, np.float64)
    N = traj.shape[0]
    fig = plt.figure(figsize=(16, 5.2))
    if title:
        fig.suptitle(title)

    # --- panel 1: 3D scene -------------------------------------------------
    ax = fig.add_subplot(1, 3, 1, projection="3d")
    oc = np.asarray(obstacle_config, np.float64).reshape(-1, obstacle_config.shape[-1])
    for row in oc:
        if np.prod(row[7:10]) <= 0:
            continue  # padding
        _add_box(ax, row[:3], _quat_to_rot(row[3:7]), row[7:10],
                 "tab:orange", 0.25)
    # link boxes at sampled waypoints (one FK batch, not per-pose eager ops)
    pick = np.unique(np.linspace(0, N - 1, n_robot_poses).astype(int))
    R, p = link_box_frames(jnp.asarray(traj[pick], jnp.float32))
    R, p = np.asarray(R, np.float64), np.asarray(p, np.float64)
    for k, wp in enumerate(pick):
        shade = 0.25 + 0.6 * k / max(len(pick) - 1, 1)
        for l in range(C.NUM_LINKS):
            _add_box(ax, p[k, l], R[k, l], C.LINK_BOX_DIMS[l],
                     (0.2, 0.3, shade), 0.28)
    # end-effector paths
    def ee_path(t):
        return np.stack([numpy_ee_transform(q)[:3, 3] for q in t])

    if rejected is not None:
        for rt in np.asarray(rejected, np.float64):
            pth = ee_path(rt)
            ax.plot(pth[:, 0], pth[:, 1], pth[:, 2], color="gray",
                    alpha=0.35, lw=0.7)
    pth = ee_path(traj)
    ax.plot(pth[:, 0], pth[:, 1], pth[:, 2], color="tab:green", lw=2.0,
            label="best EE path")
    ax.scatter(*pth[0], color="tab:green", marker="o")
    ax.scatter(*pth[-1], color="tab:red", marker="*", s=80)
    ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(0, 1.4)
    ax.set_box_aspect((1, 1, 0.7))
    ax.set_title("scene + link boxes (light = later waypoints)")

    # --- panel 2: self-collision clearance heatmap ------------------------
    ax2 = fig.add_subplot(1, 3, 2)
    cl = min_pair_clearance(traj)                  # (N, P)
    vmax = 0.1
    im = ax2.imshow(cl.T, aspect="auto", cmap="RdYlGn", vmin=-0.05,
                    vmax=vmax, interpolation="nearest")
    ax2.set_xlabel("waypoint")
    ax2.set_yticks(range(len(SELF_PAIRS)))
    ax2.set_yticklabels([f"{i}-{j}" for i, j in SELF_PAIRS], fontsize=6)
    n_pen = int((cl < 0).any(axis=1).sum())
    ax2.set_title(f"capsule clearance (red < 0: self-collision; "
                  f"{n_pen}/{N} waypoints penetrate)")
    fig.colorbar(im, ax=ax2, shrink=0.8)

    # --- panel 3: joint traces vs limits ----------------------------------
    ax3 = fig.add_subplot(1, 3, 3)
    lo = np.asarray(C.JOINT_LIMITS_LOWER)
    hi = np.asarray(C.JOINT_LIMITS_UPPER)
    for j in range(7):
        (ln,) = ax3.plot(traj[:, j], lw=1.2, label=f"q{j+1}")
        c = ln.get_color()
        ax3.axhline(lo[j], color=c, ls=":", lw=0.5, alpha=0.5)
        ax3.axhline(hi[j], color=c, ls=":", lw=0.5, alpha=0.5)
    viol = ((traj < lo[None] - 1e-9) | (traj > hi[None] + 1e-9))
    ax3.set_title(f"joint traces vs limits "
                  f"({int(viol.any(axis=1).sum())}/{N} waypoints violate)")
    ax3.set_xlabel("waypoint")
    ax3.legend(fontsize=6, ncol=4)

    fig.tight_layout()
    fig.savefig(out, dpi=130)
    plt.close(fig)
    print(f"wrote {out}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="visualize")
    ap.add_argument("--npz", default=None,
                    help="npz with obstacle_config, trajectory[, rejected]")
    ap.add_argument("--replan", action="store_true",
                    help="plan one synthetic-corpus scene, then render")
    ap.add_argument("--scene-index", type=int, default=0)
    ap.add_argument("--scenes", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--assist-sc", type=float, default=None)
    ap.add_argument("--assist-jl", type=float, default=None)
    ap.add_argument("--sc-filter-goals", action="store_true")
    ap.add_argument("--safe-selection", action="store_true")
    ap.add_argument("--n-rejected", type=int, default=8,
                    help="faint EE paths of this many rejected samples")
    ap.add_argument("--out", default="viz.png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args(argv)

    if args.npz:
        data = np.load(args.npz)
        render(data["obstacle_config"], data["trajectory"],
               data.get("rejected"), out=args.out, title=args.title)
        return 0
    if not args.replan:
        print("pass --npz or --replan", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    from edmp_tpu import constants as C
    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.costs.obstacles import pack_scene
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.robot import ik as IK
    from edmp_tpu.utils.checkpoint import load_inference_weights

    ds = synthetic_packed_dataset(np.random.default_rng(args.seed),
                                  args.scenes)
    i = args.scene_index
    obs_cfg = ds.scene_obstacle_config(i)
    T = 255
    sch = make_schedule(T)
    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, load_inference_weights(args.weights))
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)
    B = 120
    if args.assist_sc is not None or args.assist_jl is not None:
        gp = gp._replace(
            self_collision_weight=(None if args.assist_sc is None else
                                   jnp.full(B, args.assist_sc, jnp.float32)),
            joint_limit_weight=(None if args.assist_jl is None else
                                jnp.full(B, args.assist_jl, jnp.float32)))

    # the sweep's per-scene IK seeding (parallel/sweep.py:390-398)
    r = np.random.default_rng((args.seed, i))
    seeds = np.concatenate([r.uniform(-C.Q7_RANGE, C.Q7_RANGE, 50),
                            np.linspace(-C.Q7_RANGE, C.Q7_RANGE, 50)])
    target = jnp.asarray(ds.target[i], jnp.float32)
    sols, ok = jax.jit(IK.analytic_ik_batch)(
        target, jnp.asarray(seeds, jnp.float32))
    goals, valid = sols.reshape(-1, 7), ok.reshape(-1)

    cfg = P.PlannerConfig(batch_size=B,
                          sc_filter_goals=args.sc_filter_goals,
                          safety_aware_selection=args.safe_selection)
    plan_fn = P.make_plan_fn(model, sch, cfg)
    scene = pack_scene(obs_cfg)
    rng = jax.random.fold_in(jax.random.key(args.seed), i)
    res = plan_fn(params, scene, gp, jnp.asarray(ds.q0[i], jnp.float32),
                  goals, valid, rng)
    best = np.asarray(res.best)
    order = np.argsort(np.asarray(res.swept_costs))
    rej = np.asarray(res.trajectories)[
        order[1:1 + args.n_rejected]] if args.n_rejected else None
    safety_on = (args.assist_sc or args.assist_jl or args.sc_filter_goals
                 or args.safe_selection)
    render(obs_cfg, best, rej, out=args.out,
           title=args.title or f"scene {i} (seed {args.seed}"
           f"{', safety' if safety_on else ''})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
