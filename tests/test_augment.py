"""Augmentation + GT-database sampler tests."""

import numpy as np
import pytest

from lyft3d_tpu.core.geometry import points_in_boxes
from lyft3d_tpu.data.augment import (
    DataBaseSampler,
    box_collision_test,
    create_gt_database,
    global_rotation,
    global_scaling,
    global_translate,
    noise_per_object,
    random_flip,
)


def box(x, y, w=2.0, l=4.0, yaw=0.0, z=0.0, h=1.6):
    return np.array([x, y, z, w, l, h, yaw])


class TestCollision:
    def test_overlapping(self):
        assert box_collision_test(box(0, 0)[None], box(1, 0)[None])[0, 0]

    def test_disjoint(self):
        assert not box_collision_test(box(0, 0)[None], box(10, 0)[None])[0, 0]

    def test_rotated_near_miss(self):
        # Two long thin boxes crossing only when rotated.
        a = box(0, 0, w=0.5, l=6.0, yaw=0.0)
        b = box(0, 1.0, w=0.5, l=6.0, yaw=0.0)
        assert not box_collision_test(a[None], b[None])[0, 0]
        b_rot = box(0, 1.0, w=0.5, l=6.0, yaw=np.pi / 2)
        assert box_collision_test(a[None], b_rot[None])[0, 0]

    def test_corner_touch_diagonal(self):
        # SAT on rotated squares: diagonal neighbors shouldn't collide.
        a = box(0, 0, w=2, l=2, yaw=np.pi / 4)
        b = box(3.0, 3.0, w=2, l=2, yaw=np.pi / 4)
        assert not box_collision_test(a[None], b[None])[0, 0]


class TestGlobalAug:
    def setup_method(self):
        self.rng = np.random.RandomState(0)
        self.points = self.rng.uniform(-10, 10, (100, 4))
        self.boxes = np.stack([box(2, 3, yaw=0.3), box(-5, 1, yaw=-1.0)])

    def test_flip_involution(self):
        p, b = random_flip(self.points, self.boxes, self.rng, probability=1.0)
        p2, b2 = random_flip(p, b, self.rng, probability=1.0)
        np.testing.assert_allclose(p2, self.points)
        np.testing.assert_allclose(b2, self.boxes)

    def test_rotation_preserves_radius(self):
        p, b, theta = global_rotation(self.points, self.boxes, self.rng)
        np.testing.assert_allclose(
            np.linalg.norm(p[:, :2], axis=1),
            np.linalg.norm(self.points[:, :2], axis=1),
            rtol=1e-9,
        )
        np.testing.assert_allclose(b[:, 6] - self.boxes[:, 6], theta)

    def test_scaling(self):
        p, b, f = global_scaling(self.points, self.boxes, self.rng)
        np.testing.assert_allclose(p[:, :3], self.points[:, :3] * f)
        np.testing.assert_allclose(b[:, 3:6], self.boxes[:, 3:6] * f)

    def test_translate(self):
        p, b, t = global_translate(self.points, self.boxes, self.rng)
        np.testing.assert_allclose(p[0, :3] - self.points[0, :3], t)

    def test_points_follow_boxes_under_noise(self):
        rng = np.random.RandomState(1)
        boxes = np.stack([box(0, 0, yaw=0.2), box(8, 8, yaw=-0.5)])
        pts = []
        for b in boxes:
            local = rng.uniform(-0.4, 0.4, (50, 3)) * b[3:6][[1, 0, 2]]
            c, s = np.cos(b[6]), np.sin(b[6])
            px = c * local[:, 0] - s * local[:, 1] + b[0]
            py = s * local[:, 0] + c * local[:, 1] + b[1]
            pts.append(np.column_stack([px, py, local[:, 2] + b[2], np.ones(50)]))
        points = np.concatenate(pts)
        p2, b2 = noise_per_object(points, boxes, rng)
        # Boxes moved...
        assert np.abs(b2[:, [0, 1, 6]] - boxes[:, [0, 1, 6]]).sum() > 0
        # ...and their points moved with them: membership is preserved.
        member = points_in_boxes(p2[:, :3], b2[:, :3], b2[:, 3:6] * 1.05, b2[:, 6])
        assert member[0, :50].mean() > 0.95
        assert member[1, 50:].mean() > 0.95


class TestGTDatabase:
    def _make_db(self, tmp_path):
        rng = np.random.RandomState(2)
        samples = []
        for s in range(3):
            boxes = np.stack([box(3 * s, 0, yaw=0.1 * s), box(0, 8, w=1, l=1, h=1)])
            names = np.array(["car", "pedestrian"])
            pts = []
            for b in boxes:
                local = rng.uniform(-0.4, 0.4, (30, 3)) * b[3:6][[1, 0, 2]]
                pts.append(
                    np.column_stack(
                        [local[:, 0] + b[0], local[:, 1] + b[1], local[:, 2] + b[2],
                         np.ones(30)]
                    )
                )
            samples.append(
                {"points": np.concatenate(pts).astype(np.float32),
                 "gt_boxes": boxes, "gt_names": names}
            )
        return create_gt_database(tmp_path / "gtdb", samples)

    def test_create_and_load(self, tmp_path):
        db = self._make_db(tmp_path)
        assert set(db.classes()) == {"car", "pedestrian"}
        assert len(db.infos["car"]) == 3
        info = db.infos["car"][0]
        crop = np.fromfile(db.root / info["path"], np.float32).reshape(-1, 4)
        assert len(crop) == info["num_points"]
        # Crops are box-center-relative.
        assert np.abs(crop[:, :2]).max() < 3.0

    def test_sampler_places_objects(self, tmp_path):
        db = self._make_db(tmp_path)
        sampler = DataBaseSampler(db, {"car": 4, "pedestrian": 2}, seed=0)
        gt = np.stack([box(20, 20)])
        out = sampler.sample_all(gt, np.array(["car"]))
        assert out is not None
        assert len(out["boxes"]) >= 1
        # No sampled box collides with the existing GT or each other.
        allb = np.concatenate([gt, out["boxes"]])
        coll = box_collision_test(allb, allb)
        np.fill_diagonal(coll, False)
        assert not coll.any()
        # Pasted points sit inside their boxes.
        member = points_in_boxes(
            out["points"][:, :3], out["boxes"][:, :3],
            out["boxes"][:, 3:6] * 1.05, out["boxes"][:, 6],
        )
        assert member.any(axis=0).mean() > 0.9

    def test_sampler_respects_existing_count(self, tmp_path):
        db = self._make_db(tmp_path)
        sampler = DataBaseSampler(db, {"car": 2}, seed=0)
        gt = np.stack([box(0, 0), box(6, 0)])
        out = sampler.sample_all(gt, np.array(["car", "car"]))
        assert out is None  # already at quota
