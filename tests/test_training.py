"""Training tests: loss decreases on a learnable toy problem, checkpoint
round trip, HDF5 ingestion, inference-weight export."""

import numpy as np

import jax
import jax.numpy as jnp

from edmp_tpu.data.synthetic import smooth_trajectories
from edmp_tpu.diffusion.schedule import make_schedule
from edmp_tpu.diffusion.training import (TrainConfig, init_state,
                                         make_train_step)
from edmp_tpu.models import temporal_unet as tu


def test_loss_decreases_tiny_model():
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    cfg = TrainConfig(learning_rate=3e-3, batch_size=32)
    sch = make_schedule(16)
    state = init_state(model, jax.random.key(0), cfg, traj_len=12)
    step = jax.jit(make_train_step(model, sch, cfg))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(smooth_trajectories(rng, 32, 12))
    losses = []
    key = jax.random.key(1)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, loss = step(state, x0, sub)
        losses.append(float(loss))
    # epsilon-prediction has an irreducible noise floor near 1.0 for a tiny
    # model; assert clear initial descent rather than a deep plateau.
    assert np.mean(losses[-10:]) < np.mean(losses[:5]) - 0.1
    assert int(state.step) == 60


def test_ema_tracks_params():
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    cfg = TrainConfig(learning_rate=1e-3, batch_size=8, ema_decay=0.9)
    sch = make_schedule(8)
    state = init_state(model, jax.random.key(0), cfg, traj_len=12)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(model, sch, cfg))
    x0 = jnp.asarray(smooth_trajectories(np.random.default_rng(0), 8, 12))
    state2, _ = step(state, x0, jax.random.key(1))
    # EMA moved but less than params did
    p_delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                           state.params, state2.params)
    e_delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                           state.ema_params, state2.ema_params)
    pmax = max(jax.tree.leaves(p_delta))
    emax = max(jax.tree.leaves(e_delta))
    assert 0 < emax < pmax


def test_checkpoint_roundtrip(tmp_path):
    from edmp_tpu.utils.checkpoint import TrainCheckpointer

    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    cfg = TrainConfig(batch_size=4)
    state = init_state(model, jax.random.key(0), cfg, traj_len=12)
    ck = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=1)
    ck.note_loss(0.5)
    ck.save(1, jax.device_get(state))
    ck.wait()
    assert ck.latest_step() == 1

    ck2 = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=1)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
    restored = ck2.restore(abstract)
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_inference_weight_export_roundtrip(tmp_path):
    from edmp_tpu.utils.checkpoint import (export_inference_weights,
                                           load_inference_weights)

    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=12)
    path = str(tmp_path / "w.npz")
    export_inference_weights(params, path)
    loaded = load_inference_weights(path)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(jax.tree.map(jnp.asarray, loaded))
    assert len(a) == len(b)
    x = jnp.zeros((1, 12, 7))
    y1 = model.apply({"params": params}, x, jnp.ones(1))
    y2 = model.apply({"params": loaded}, x, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_hdf5_dataset(tmp_path):
    import h5py

    from edmp_tpu.data.hdf5 import TrajectoryDataset

    path = str(tmp_path / "train.hdf5")
    rng = np.random.default_rng(0)
    trajs = smooth_trajectories(rng, 20, 50)
    with h5py.File(path, "w") as f:
        f["hybrid_solutions"] = trajs
        f["cuboid_centers"] = rng.normal(0, 0.4, (20, 5, 3))
        dims = rng.uniform(0.1, 0.3, (20, 5, 3))
        dims[:, 3:] = 0  # padded rows
        f["cuboid_dims"] = dims
        q = np.zeros((20, 5, 4))
        q[..., 0] = 1  # wxyz identity
        f["cuboid_quaternions"] = q
        f["cylinder_centers"] = np.zeros((20, 3, 3))
        h = np.zeros((20, 3, 1))
        f["cylinder_heights"] = h
        f["cylinder_radii"] = np.zeros((20, 3, 1))
        f["cylinder_quaternions"] = np.tile(
            np.array([1.0, 0, 0, 0]), (20, 3, 1))

    ds = TrajectoryDataset(path)
    assert ds.num_trajectories == 20 and ds.traj_len == 50
    batch = next(ds.batches(8, rng))
    assert batch.shape == (8, 50, 7)

    prob = ds.scene(0)
    assert prob.obstacle_config.shape == (3, 10)  # 3 real cuboids, 0 cylinders
    np.testing.assert_allclose(prob.q0, trajs[0, 0], atol=1e-6)
    ds.close()
