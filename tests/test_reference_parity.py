"""Head-to-head parity against the ACTUAL reference torch code.

Round 1 proved edmp_tpu against torch layers *reassembled* from reading the
reference; these tests import the real thing from /root/reference (torch is
installed in this environment) and assert elementwise agreement on identical
inputs:

  * lib/guide.py:354-395   IntersectionVolumeGuide.cost
  * lib/guide.py:473-537   swept_volume_cost
  * lib/guide.py:597-635   get_gradient (iv/sv blend + whole-tensor grad norm)
  * lib/guide.py:637-653   choose_best_trajectory
  * diffusion/diffusion.py:300-356  Diffusion.denoise_guided (full 255-step
    trace with injected noise and a converted torch UNet)

The reference's mesh-parsing ``define_link_information`` needs pybullet_data
(absent here), so it is monkeypatched to the vendored link boxes/static frames
(edmp_tpu/constants.py) — both sides share the same geometry constants, which
is exactly what we want: the *math* is under test, not the box dims.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from edmp_tpu import constants as C
from edmp_tpu.config import pack_ensemble, reference_guide_configs
from edmp_tpu.costs import guide as jguide
from edmp_tpu.costs.grad_kernel import guidance_gradient_manual
from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene
from edmp_tpu.diffusion.sampler import denoise_guided
from edmp_tpu.diffusion.schedule import make_schedule
from edmp_tpu.models.convert import torch_state_dict_to_params
from edmp_tpu.models.temporal_unet import create_model

REF_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# Reference import harness
# ---------------------------------------------------------------------------

def _install_stubs():
    """Stub the two reference deps absent from this env.

    * pybullet_data: only used by the mesh-parsing branch we monkeypatch out.
    * torchvision.transforms.functional.crop: standard tensor slice semantics.
    """
    if "pybullet_data" not in sys.modules:
        stub = types.ModuleType("pybullet_data")
        stub.getDataPath = lambda: "/nonexistent"
        sys.modules["pybullet_data"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")

        def crop(img, top, left, height, width):
            return img[..., top:top + height, left:left + width]

        fn.crop = crop
        tv.transforms = tr
        tr.functional = fn
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn


def _vendored_link_information(self):
    """Replacement for lib/guide.py:243-342: vendored constants, no meshes."""
    self.link_index_to_name = [
        "link1", "link2", "link3", "link4", "link5", "link6", "link7",
        "hand", "finger",
    ]
    self.link_dimensions = torch.tensor(
        np.asarray(C.LINK_BOX_DIMS), dtype=torch.float32, device=self.device)
    self.link_vertices = self.get_link_vertices(self.link_dimensions)
    self.link_static_joint_frame = [1, 2, 3, 4, 5, 6, 7, 7, 7]
    self.static_frames = torch.tensor(
        np.asarray(C.LINK_STATIC_FRAMES), dtype=torch.float32,
        device=self.device)


@pytest.fixture(scope="module")
def ref():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _install_stubs()
    import diffusion.diffusion as ref_diffusion
    import diffusion.models.temporalunet as ref_unet

    # lib/__init__.py drags in pybullet via environment.py; guide.py itself
    # has no package-relative imports, so load it straight from its path.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_lib_guide", REF_PATH + "/lib/guide.py")
    ref_guide = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_guide)

    ref_guide.IntersectionVolumeGuide.define_link_information = \
        _vendored_link_information
    return types.SimpleNamespace(
        guide=ref_guide, diffusion=ref_diffusion, unet=ref_unet)


# ---------------------------------------------------------------------------
# Shared random problem
# ---------------------------------------------------------------------------

N_OBS = 4
BATCH = 8
T = C.DEFAULT_T


def _random_problem(seed=0, n_obs=N_OBS, batch=BATCH, n_way=12):
    r = np.random.default_rng(seed)
    centers = r.uniform([-0.6, -0.6, 0.0], [0.6, 0.6, 0.8], (n_obs, 3))
    quats = r.normal(size=(n_obs, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    dims = r.uniform(0.1, 0.5, (n_obs, 3))
    obstacle_config = np.concatenate([centers, quats, dims], axis=-1)

    lo, hi = np.asarray(C.JOINT_LIMITS_LOWER), np.asarray(C.JOINT_LIMITS_UPPER)
    u = r.uniform(0.1, 0.9, (batch, n_way, 7))
    joints = lo + u * (hi - lo)          # (B, N, 7) channels-last
    start = lo + r.uniform(0.2, 0.8, 7) * (hi - lo)
    goal = lo + r.uniform(0.2, 0.8, 7) * (hi - lo)
    return obstacle_config, joints, start, goal


def _mixed_guide_params(batch=BATCH):
    """Per-sample hyperparameters spanning iv/sv and grad_norm on/off."""
    # guides 1 (iv, no norm), 11 (sv, norm), 13 (sv, norm), 9 (iv, norm)
    gp, _ = pack_ensemble(reference_guide_configs([1, 11, 13, 9]),
                          batch_per_guide=batch // 4, T=T)
    return gp


def _ref_guide_cfgs(gp):
    return {
        "clearance": np.asarray(gp.clearance, np.float64),
        "expansion": np.asarray(gp.expansion, np.float64),
        "guidance_method": np.asarray(gp.guidance_method, np.float64),
        "grad_norm": np.asarray(gp.grad_norm, np.float64),
    }


def _make_ref_guide(ref, obstacle_config, gp, batch=BATCH):
    return ref.guide.IntersectionVolumeGuide(
        obstacle_config, "cpu", _ref_guide_cfgs(gp), batch)


def _scene(obstacle_config, n_obs=N_OBS):
    return pack_scene(obstacle_config, max_obstacles=n_obs)


def _obs_lohi(scene, gp, t, batch=BATCH):
    if t == 0:
        lo, hi = obstacle_aabbs(scene)
        lo = jnp.broadcast_to(lo, (batch,) + lo.shape)
        hi = jnp.broadcast_to(hi, (batch,) + hi.shape)
    else:
        lo, hi = obstacle_aabbs(scene, expansion=gp.expansion[:, t - 1],
                                clearance=gp.clearance[:, t - 1])
    return lo, hi


# ---------------------------------------------------------------------------
# Cost / gradient parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t", [0, 1, 100, 254])
def test_cost_parity(ref, t):
    cfg, joints, _, _ = _random_problem()
    gp = _mixed_guide_params()
    g = _make_ref_guide(ref, cfg, gp)

    ref_vols = g.cost(
        torch.tensor(joints.transpose(0, 2, 1), dtype=torch.float32), t
    ).detach().numpy()                       # (B, N, no*nl) with index l*no+o

    scene = _scene(cfg)
    lo, hi = _obs_lohi(scene, gp, t)
    mine = jguide.intersection_volumes(jnp.asarray(joints, jnp.float32),
                                       lo, hi)  # (B, N, L, O)
    mine = np.asarray(mine).reshape(ref_vols.shape)
    np.testing.assert_allclose(mine, ref_vols, atol=2e-5, rtol=1e-4)
    assert ref_vols.max() > 0, "degenerate test: no overlap anywhere"


@pytest.mark.parametrize("t", [0, 100])
def test_swept_volume_parity(ref, t):
    cfg, joints, start, goal = _random_problem(seed=1)
    gp = _mixed_guide_params()
    g = _make_ref_guide(ref, cfg, gp)

    ref_vols = g.swept_volume_cost(
        torch.tensor(joints.transpose(0, 2, 1), dtype=torch.float32),
        torch.tensor(start, dtype=torch.float32),
        torch.tensor(goal, dtype=torch.float32), t,
    ).detach().numpy()                       # (B, N+1, no*nl)

    scene = _scene(cfg)
    lo, hi = _obs_lohi(scene, gp, t)
    mine = jguide.swept_volumes(jnp.asarray(joints, jnp.float32),
                                jnp.asarray(start, jnp.float32),
                                jnp.asarray(goal, jnp.float32), lo, hi)
    mine = np.asarray(mine).reshape(ref_vols.shape)
    np.testing.assert_allclose(mine, ref_vols, atol=2e-5, rtol=1e-4)
    assert ref_vols.max() > 0


@pytest.mark.parametrize("t", [6, 100, 254])
def test_gradient_parity(ref, t):
    """lib/guide.py:597-635 vs both the jax.grad engine and the hand-derived
    lane-major kernel, on mixed iv/sv + grad_norm hyperparameters."""
    cfg, joints, start, goal = _random_problem(seed=2)
    gp = _mixed_guide_params()
    g = _make_ref_guide(ref, cfg, gp)

    ref_grad = g.get_gradient(joints.transpose(0, 2, 1), start, goal, t)
    ref_grad = ref_grad.transpose(0, 2, 1)   # -> (B, N, 7)

    scene = _scene(cfg)
    lo, hi = _obs_lohi(scene, gp, t)
    jj = jnp.asarray(joints, jnp.float32)
    js, jg = jnp.asarray(start, jnp.float32), jnp.asarray(goal, jnp.float32)

    auto = np.asarray(jguide.guidance_gradient(jj, js, jg, lo, hi, gp))
    manual = np.asarray(guidance_gradient_manual(jj, js, jg, lo, hi, gp))

    assert np.abs(ref_grad).max() > 0, "degenerate test: zero gradient"
    np.testing.assert_allclose(auto, ref_grad, atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(manual, ref_grad, atol=3e-5, rtol=1e-3)


def test_choose_best_trajectory_parity(ref):
    cfg, _, start, goal = _random_problem(seed=3)
    gp = _mixed_guide_params()
    g = _make_ref_guide(ref, cfg, gp)

    r = np.random.default_rng(7)
    lo_l = np.asarray(C.JOINT_LIMITS_LOWER)
    hi_l = np.asarray(C.JOINT_LIMITS_UPPER)
    trajs = (lo_l[:, None]
             + r.uniform(0.1, 0.9, (BATCH, 7, 50)) * (hi_l - lo_l)[:, None])

    best_ref = g.choose_best_trajectory(start, goal, trajs)

    scene = _scene(cfg)
    idx = int(jguide.best_trajectory_index(
        jnp.asarray(trajs.transpose(0, 2, 1)[:, 1:-1, :], jnp.float32),
        jnp.asarray(start, jnp.float32), jnp.asarray(goal, jnp.float32),
        scene))
    np.testing.assert_array_equal(trajs[idx], best_ref)


def test_ik_goal_volume_parity(ref):
    """The IK-filter cost (infer_serial.py:119-129): single-waypoint cost at
    t=0, summed per candidate."""
    cfg, _, _, _ = _random_problem(seed=4)
    gp = _mixed_guide_params(batch=BATCH)
    g = _make_ref_guide(ref, cfg, gp)

    r = np.random.default_rng(11)
    lo_l = np.asarray(C.JOINT_LIMITS_LOWER)
    hi_l = np.asarray(C.JOINT_LIMITS_UPPER)
    goals = lo_l + r.uniform(0.05, 0.95, (BATCH, 7)) * (hi_l - lo_l)

    ref_vols = g.cost(
        torch.tensor(goals[:, :, None], dtype=torch.float32), 0
    ).detach().numpy().sum(axis=(1, 2))

    scene = _scene(cfg)
    mine = np.asarray(jguide.ik_goal_volumes(jnp.asarray(goals, jnp.float32),
                                             scene))
    np.testing.assert_allclose(mine, ref_vols, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full guided-sampler trace parity (the round-1 quirks, proven by execution)
# ---------------------------------------------------------------------------

def test_denoise_guided_trace_parity(ref, tmp_path, monkeypatch):
    """Run the reference Diffusion.denoise_guided end-to-end (255 steps, torch
    UNet, real guide) with recorded noise, and assert the JAX sampler
    reproduces the final trajectories."""
    b, n_traj, dims = 4, 50, (8, 16, 16, 16, 16, 16)
    cfg, _, start, goal = _random_problem(seed=5, batch=b)
    gp, _ = pack_ensemble(reference_guide_configs([1, 11]),
                          batch_per_guide=b // 2, T=T)
    g = _make_ref_guide(ref, cfg, gp, batch=b)

    # seed the torch init: otherwise the weights depend on which torch-using
    # tests ran earlier, and the drift-tail tolerance becomes order-dependent
    torch.manual_seed(0)
    tmodel = ref.unet.TemporalUNet(str(tmp_path / "m"), 7, 32, "cpu",
                                   dims=dims)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_dict_to_params(sd)
    jmodel = create_model(input_dim=7, time_dim=32, dims=dims)

    # sanity: single forward parity through the real reference module
    x0 = np.random.default_rng(6).normal(size=(b, 7, n_traj)).astype(np.float32)
    with torch.no_grad():
        eps_t = tmodel(torch.tensor(x0), torch.tensor([200.0])).numpy()
    eps_j = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x0.transpose(0, 2, 1)),
        jnp.asarray([200.0])))
    np.testing.assert_allclose(eps_j.transpose(0, 2, 1), eps_t,
                               atol=2e-5, rtol=1e-3)

    # deterministic noise: 1 init draw + T posterior draws, replayed into the
    # reference's np.random.multivariate_normal calls
    nr = np.random.default_rng(12)
    draws = [nr.standard_normal((b, 7, n_traj)) for _ in range(T + 1)]
    it = iter(draws)

    def fake_mvn(mean, cov, size):
        z = next(it)
        assert z.shape == tuple(size) + (len(mean),)
        return z

    monkeypatch.setattr(np.random, "multivariate_normal", fake_mvn)
    diffuser = ref.diffusion.Diffusion(T, "cpu")
    sched_np = np.asarray(gp.guidance_schedule, np.float64)
    ref_out = diffuser.denoise_guided(
        tmodel, g, n_traj, 7, sched_np, batch_size=b, start=start, goal=goal,
        condition=True, benchmarking=True)           # (B, 7, N)
    assert next(it, None) is None, "reference consumed an unexpected draw count"

    # replay the same draws through the JAX sampler: draw order is t=T..1
    init_noise = draws[0].transpose(0, 2, 1)
    step_noise = np.zeros((T, b, n_traj, 7), np.float32)
    for i, t in enumerate(range(T, 0, -1)):
        step_noise[t - 1] = draws[1 + i].transpose(0, 2, 1)

    schedule = make_schedule(T)
    scene = _scene(cfg)
    out = denoise_guided(
        lambda p, x, t: jmodel.apply({"params": p}, x, t),
        params, schedule, scene, gp,
        jnp.asarray(start, jnp.float32), jnp.asarray(goal, jnp.float32),
        jax.random.PRNGKey(0), batch_size=b, traj_len=n_traj,
        init_noise=init_noise, step_noise=step_noise)
    out = np.asarray(out).transpose(0, 2, 1)          # -> (B, 7, N)

    # 255 steps of drift: the reference does its host math in float64 while
    # the fused scan is float32, and the guidance gradient is discontinuous at
    # clip/AABB boundaries, so a handful of elements amplify chaotically.  A
    # wrong quirk (cadence, cutoff, beta*z noise, schedule indexing, endpoint
    # pinning) shifts the WHOLE tensor by O(1); we assert the trace agrees
    # everywhere except a small drift tail.
    diff = np.abs(out - ref_out)
    tol = 5e-3 + 5e-3 * np.abs(ref_out)
    frac_bad = float((diff > tol).mean())
    rel_frob = float(np.linalg.norm(diff) / np.linalg.norm(ref_out))
    assert frac_bad < 0.05, f"{frac_bad:.2%} of elements off (> tol)"
    assert float(np.median(diff)) < 1e-3
    assert rel_frob < 5e-3, f"relative Frobenius error {rel_frob:.2e}"
