"""Target-region protocol term (mpinets/metrics.py:388-407,530-542).

Covers the typed-volume SDFs, the check_final_region semantics including the
bad-negative-volume correction, pickle ingestion of target_volume /
target_negative_volumes through the shim unpickler, and the evaluator-level
verdict flip: a final pose meeting the 1cm/15deg thresholds but in the WRONG
region must fail protocol success.
"""

import pickle

import numpy as np
import pytest

from edmp_tpu.data.problems import (MAX_NEGATIVE_VOLUMES, VOLUME_CUBOID,
                                    VOLUME_CYLINDER, VOLUME_SPHERE,
                                    PackedDataset, load_reference_pickle)
from edmp_tpu.metrics.region import check_final_region, has_region, volume_sdf

from tests.test_reference_pickle import (SE3, Cuboid, Cylinder,
                                         PlanningProblem, Sphere,
                                         _make_problem, _register_all)


def _cuboid_row(center, dims, quat_xyzw=(0, 0, 0, 1)):
    return np.concatenate([[VOLUME_CUBOID], center, quat_xyzw, dims])


def _cylinder_row(center, radius, height, quat_xyzw=(0, 0, 0, 1)):
    return np.concatenate([[VOLUME_CYLINDER], center, quat_xyzw,
                           [radius, height, 0.0]])


def _sphere_row(center, radius):
    return np.concatenate([[VOLUME_SPHERE], center, [0, 0, 0, 1],
                           [radius, 0.0, 0.0]])


class TestVolumeSdf:
    def test_absent_is_never_inside(self):
        assert volume_sdf(np.zeros(3), np.zeros(11)) == np.inf
        assert not has_region(np.zeros(11))

    def test_cuboid_inside_outside(self):
        row = _cuboid_row([1.0, 0.0, 0.5], [0.2, 0.4, 0.6])
        assert volume_sdf([1.0, 0.0, 0.5], row) < 0
        assert volume_sdf([1.05, 0.1, 0.6], row) < 0
        # just past the +x face: sdf ~= +0.05
        assert volume_sdf([1.15, 0.0, 0.5], row) == pytest.approx(0.05, abs=1e-9)
        assert volume_sdf([2.0, 0.0, 0.5], row) > 0

    def test_cuboid_rotation(self):
        # 90deg about z: the x half-extent becomes the y half-extent
        quat = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
        row = _cuboid_row([0, 0, 0], [0.2, 1.0, 0.2], quat)
        assert volume_sdf([0.4, 0.0, 0.0], row) < 0     # inside rotated long axis
        assert volume_sdf([0.0, 0.4, 0.0], row) > 0     # outside short axis

    def test_cylinder(self):
        row = _cylinder_row([0, 0, 1.0], radius=0.3, height=0.4)
        assert volume_sdf([0, 0, 1.0], row) < 0
        assert volume_sdf([0.29, 0, 1.0], row) < 0
        assert volume_sdf([0.4, 0, 1.0], row) == pytest.approx(0.1, abs=1e-9)
        assert volume_sdf([0, 0, 1.3], row) == pytest.approx(0.1, abs=1e-9)

    def test_sphere(self):
        row = _sphere_row([1, 1, 1], 0.5)
        assert volume_sdf([1, 1, 1.2], row) == pytest.approx(-0.3, abs=1e-9)
        assert volume_sdf([1, 1, 2.0], row) == pytest.approx(0.5, abs=1e-9)


class TestCheckFinalRegion:
    target_vol = _cuboid_row([0.5, 0.0, 0.5], [0.2, 0.2, 0.2])
    target_pos = np.array([0.5, 0.0, 0.5])

    def test_inside_passes_outside_fails(self):
        no_negs = np.zeros((0, 11))
        assert check_final_region([0.5, 0.0, 0.5], self.target_vol, no_negs,
                                  self.target_pos)
        assert not check_final_region([0.9, 0.0, 0.5], self.target_vol,
                                      no_negs, self.target_pos)

    def test_negative_volume_excludes(self):
        # wrong-drawer negative adjacent to the target volume
        neg = _cuboid_row([0.5, 0.3, 0.5], [0.2, 0.2, 0.2])[None]
        # final pose inside target vol -> ok
        assert check_final_region([0.5, 0.0, 0.5], self.target_vol, neg,
                                  self.target_pos)
        # widen the target volume so a point can be in BOTH; inside a
        # negative region -> fail even though inside the target volume
        wide = _cuboid_row([0.5, 0.15, 0.5], [0.2, 0.5, 0.2])
        assert not check_final_region([0.5, 0.3, 0.5], wide, neg,
                                      self.target_pos)

    def test_bad_negative_volume_corrected(self):
        # a negative volume CONTAINING the target is bad data and must be
        # dropped (mpinets/metrics.py:530-534)
        bad_neg = _cuboid_row([0.5, 0.0, 0.5], [1.0, 1.0, 1.0])[None]
        assert check_final_region([0.5, 0.0, 0.5], self.target_vol, bad_neg,
                                  self.target_pos)

    def test_padding_rows_harmless(self):
        negs = np.zeros((MAX_NEGATIVE_VOLUMES, 11))
        negs[:, 7] = 1.0
        assert check_final_region([0.5, 0.0, 0.5], self.target_vol, negs,
                                  self.target_pos)

    def test_absent_target_volume_passes(self):
        assert check_final_region([9, 9, 9], np.zeros(11), np.zeros((0, 11)),
                                  self.target_pos)


class TestPickleIngestion:
    def test_region_round_trip(self, tmp_path, rng):
        _register_all()
        p = _make_problem(rng, 2, 1)
        p.target_volume = Cylinder([0.4, 0.1, 0.3], 0.25, 0.5,
                                   [1, 0, 0, 0])
        sph = Sphere()
        sph._pose = SE3([0.1, 0.2, 0.3], [1, 0, 0, 0])
        sph._radius = 0.15
        p.target_negative_volumes = [
            Cuboid([0.0, 0.5, 0.2], [0.1, 0.2, 0.3], [1, 0, 0, 0]), sph]
        data = {"tabletop": {"task_oriented": [p], "neutral_start": [],
                             "neutral_goal": []}}
        path = tmp_path / "x_solvable_problems.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f)

        got = load_reference_pickle(str(path))["tabletop"][0]
        assert got.target_volume[0] == VOLUME_CYLINDER
        np.testing.assert_allclose(got.target_volume[1:4], [0.4, 0.1, 0.3])
        np.testing.assert_allclose(got.target_volume[8:10], [0.25, 0.5])
        assert got.negative_volumes.shape == (2, 11)
        assert got.negative_volumes[0, 0] == VOLUME_CUBOID
        np.testing.assert_allclose(got.negative_volumes[0, 8:11],
                                   [0.1, 0.2, 0.3])
        assert got.negative_volumes[1, 0] == VOLUME_SPHERE
        np.testing.assert_allclose(got.negative_volumes[1, 1:4],
                                   [0.1, 0.2, 0.3])
        assert got.negative_volumes[1, 8] == pytest.approx(0.15)

        # pack + npz round trip keeps the region rows
        ds = PackedDataset.from_problems([got])
        out = tmp_path / "packed.npz"
        ds.save(str(out))
        ds2 = PackedDataset.load(str(out))
        np.testing.assert_allclose(ds2.target_volume, ds.target_volume)
        np.testing.assert_allclose(ds2.negative_volumes, ds.negative_volumes)
        assert ds2.n_negative[0] == 2
        sel = ds2.select([0])
        assert sel.target_volume.shape == (1, 11)

    def test_legacy_npz_loads_without_regions(self, tmp_path, rng):
        _register_all()
        ds = PackedDataset.from_problems(
            [load_reference_pickle_problem(rng)])
        np.savez_compressed(
            tmp_path / "legacy.npz", obstacles=ds.obstacles,
            n_obstacles=ds.n_obstacles, q0=ds.q0, target=ds.target,
            scene_type_id=ds.scene_type_id, problem_type_id=ds.problem_type_id)
        ds2 = PackedDataset.load(str(tmp_path / "legacy.npz"))
        assert ds2.target_volume.shape == (1, 11)
        assert not has_region(ds2.target_volume[0])
        assert ds2.n_negative[0] == 0


def load_reference_pickle_problem(rng):
    from edmp_tpu.data.problems import problem_from_reference
    return problem_from_reference(_make_problem(rng, 1, 0))


class TestEvaluatorIntegration:
    def _eval_at(self, q_final, target_volume, negative_volumes):
        """Evaluate a trivial 3-waypoint trajectory ending at q_final with
        the target pose EQUAL to the final EE pose, so position/orientation
        errors are ~0 and only the region term can fail."""
        import jax.numpy as jnp

        from edmp_tpu.metrics.evaluator import Evaluator
        from edmp_tpu.robot.kinematics import ee_transform

        T = np.asarray(ee_transform(jnp.asarray(q_final, jnp.float32)),
                       np.float64)
        traj = np.tile(np.asarray(q_final, np.float64), (3, 1))
        ev = Evaluator(check_self_collision=False)
        return ev.evaluate_trajectory(
            traj, T, np.zeros((0, 10)),
            target_volume=target_volume,
            negative_volumes=negative_volumes), T

    def test_region_flips_verdict(self):
        import jax.numpy as jnp

        from edmp_tpu import constants as C
        from edmp_tpu.robot.kinematics import ee_transform

        q = 0.5 * (np.asarray(C.FRANKA_LOWER) + np.asarray(C.FRANKA_UPPER))
        T = np.asarray(ee_transform(jnp.asarray(q, jnp.float32)), np.float64)
        ee = T[:3, 3]

        inside = _cuboid_row(ee, [0.2, 0.2, 0.2])
        outside = _cuboid_row(ee + np.array([0.0, 0.0, 1.0]), [0.2, 0.2, 0.2])

        ev_in, _ = self._eval_at(q, inside, np.zeros((0, 11)))
        assert ev_in.region_checked and ev_in.correct_final_region
        assert ev_in.position_error < 1e-3
        assert ev_in.success

        ev_out, _ = self._eval_at(q, outside, np.zeros((0, 11)))
        assert ev_out.region_checked and not ev_out.correct_final_region
        assert not ev_out.success  # SAME pose accuracy, wrong region

        # negative volume containing the final pose (target vol widened so
        # the pose is inside both): also fails
        neg = _sphere_row(ee, 0.3)[None]
        ev_neg, _ = self._eval_at(q, inside, neg)
        # the negative contains the target too -> corrected away -> passes
        assert ev_neg.correct_final_region

        neg_off = _sphere_row(ee + np.array([0.05, 0.0, 0.0]), 0.06)[None]
        # contains final pose (dist 0.05 < 0.06) ... and also the target
        # (same point) -> corrected.  Use a negative that contains the final
        # pose but NOT the target: move the target_pose instead.
        from edmp_tpu.metrics.evaluator import Evaluator

        traj = np.tile(q, (3, 1))
        T_shift = T.copy()
        T_shift[:3, 3] += np.array([0.005, 0.0, 0.0])  # still < 1cm pos err
        wide = _cuboid_row(ee, [0.5, 0.5, 0.5])
        neg_final_only = _sphere_row(ee - np.array([0.004, 0.0, 0.0]), 0.0045)
        ev2 = Evaluator(check_self_collision=False).evaluate_trajectory(
            traj, T_shift, np.zeros((0, 10)), target_volume=wide,
            negative_volumes=neg_final_only[None])
        # negative contains final EE (dist 0.004 < 0.0045) but not the
        # shifted target (dist 0.009 > 0.0045) -> region fails
        assert not ev2.correct_final_region
        assert not ev2.success

    def test_no_region_data_flagged(self):
        from edmp_tpu import constants as C

        q = 0.5 * (np.asarray(C.FRANKA_LOWER) + np.asarray(C.FRANKA_UPPER))
        ev, _ = self._eval_at(q, np.zeros(11), np.zeros((0, 11)))
        assert not ev.region_checked
        assert ev.correct_final_region  # vacuous
