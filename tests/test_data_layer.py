"""Tests for the Lyft table DB, point-cloud IO, map mask, and splits,
driven by the synthetic dataset generator."""

import numpy as np
import pytest

from lyft3d_tpu.core.geometry import points_in_box, transform_matrix
from lyft3d_tpu.core.quaternion import quat_from_yaw, quat_slerp, quaternion_yaw
from lyft3d_tpu.data import LidarPointCloud, LyftDB, MapMask
from lyft3d_tpu.data.pointcloud import load_multisweep
from lyft3d_tpu.data.splits import split_parts, train_val_split
from lyft3d_tpu.data.synthetic import make_synthetic_lyft


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("lyft"), num_scenes=2, samples_per_scene=3, seed=0
    )
    return LyftDB(root, root / "data")


class TestLyftDB:
    def test_tables_loaded(self, db):
        assert len(db.scene) == 2
        assert len(db.sample) == 6
        # one lidar + one camera sample_data per keyframe
        assert len(db.sample_data) == 12
        assert len(db.category) == 9
        assert len(db.sample_annotation) == 2 * 3 * 6

    def test_get_and_getind(self, db):
        tok = db.sample[0]["token"]
        assert db.get("sample", tok)["token"] == tok
        assert db.sample[db.getind("sample", tok)]["token"] == tok

    def test_field2token(self, db):
        toks = db.field2token("sample", "scene_token", db.scene[0]["token"])
        assert len(toks) == 3

    def test_decoration(self, db):
        ann = db.sample_annotation[0]
        assert "category_name" in ann
        sd = db.sample_data[0]
        assert sd["channel"] == "LIDAR_TOP"
        sample = db.get("sample", sd["sample_token"])
        assert sample["data"]["LIDAR_TOP"]
        assert len(sample["anns"]) == 6

    def test_scene_walk(self, db):
        toks = db.sample_tokens_of_scene(db.scene[0]["token"])
        assert len(toks) == 3
        # Chain order must match next pointers.
        assert db.get("sample", toks[0])["next"] == toks[1]

    def test_get_boxes_world_frame(self, db):
        sd_tok = db.sample[0]["data"]["LIDAR_TOP"]
        boxes = db.get_boxes(sd_tok)
        assert len(boxes) == 6
        for b in boxes:
            ann = db.get("sample_annotation", b.token)
            np.testing.assert_allclose(b.center, ann["translation"])

    def test_boxes_in_sensor_frame_contain_cluster_points(self, db):
        """The synthetic sweeps put point clusters inside each GT box; after
        transforming boxes world→sensor they must contain those points."""
        sd_tok = db.sample[0]["data"]["LIDAR_TOP"]
        pc = LidarPointCloud.from_file(db.get_sample_data_path(sd_tok))
        boxes = db.get_boxes_in_sensor_frame(sd_tok)
        total_inside = 0
        for b in boxes:
            inside = points_in_box(b, pc.xyz.T, wlh_factor=1.01)
            total_inside += int(inside.sum())
        # Half the sweep points are in-box clusters by construction.
        assert total_inside >= 0.45 * len(pc)

    def test_box_velocity(self, db):
        # Middle annotation of an instance chain → centered difference.
        ann = next(
            a for a in db.sample_annotation if a["prev"] != "" and a["next"] != ""
        )
        vel = db.box_velocity(ann["token"])
        assert np.all(np.isfinite(vel))
        prev = db.get("sample_annotation", ann["prev"])
        nxt = db.get("sample_annotation", ann["next"])
        expect = (
            np.asarray(nxt["translation"]) - np.asarray(prev["translation"])
        ) / 1.0  # 2 × 0.5 s
        np.testing.assert_allclose(vel, expect, atol=1e-6)

    def test_box_velocity_nan_for_singleton(self, db):
        ann = next(a for a in db.sample_annotation if a["prev"] == "")
        first_only = dict(ann)
        if ann["next"] == "":
            assert np.all(np.isnan(db.box_velocity(ann["token"])))

    def test_pose_matrices_roundtrip(self, db):
        sd_tok = db.sample_data[0]["token"]
        fwd = db.ego_pose_matrix(sd_tok) @ db.sensor_pose_matrix(sd_tok)
        inv = db.sensor_pose_matrix(sd_tok, inverse=True) @ db.ego_pose_matrix(
            sd_tok, inverse=True
        )
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-9)

    def test_map_mask_path(self, db):
        p = db.map_mask_path(db.sample[0]["token"])
        assert p is not None and p.exists()

    def test_missing_annotation_tables_ok(self, tmp_path):
        root = make_synthetic_lyft(tmp_path / "t", num_scenes=1, samples_per_scene=2)
        for name in ("sample_annotation", "instance"):
            (root / "data" / f"{name}.json").unlink()
        test_db = LyftDB(root, root / "data")
        assert test_db.sample_annotation == []
        assert len(test_db.sample) == 2


class TestPointCloud:
    def test_from_file_shape(self, db):
        pc = LidarPointCloud.from_file(db.get_sample_data_path(db.sample_data[0]["token"]))
        assert pc.points.shape[1] == 4
        assert pc.points.dtype == np.float32
        assert len(pc) > 1000

    def test_transform_matches_manual(self, db):
        pc = LidarPointCloud.from_file(db.get_sample_data_path(db.sample_data[0]["token"]))
        ref = pc.points[:, :3].copy()
        tm = transform_matrix([1, 2, 3], quat_from_yaw(0.5))
        pc.transform(tm)
        manual = ref @ tm[:3, :3].astype(np.float32).T + tm[:3, 3].astype(np.float32)
        np.testing.assert_allclose(pc.points[:, :3], manual, atol=1e-5)

    def test_remove_close(self):
        pts = np.array([[0.1, 0.1, 0, 0], [5, 5, 0, 0]], dtype=np.float32)
        pc = LidarPointCloud(pts.copy()).remove_close(1.0)
        assert len(pc) == 1

    def test_multisweep_aggregation(self, db):
        # Last sample of scene 0 has 2 prior sweeps available.
        sd_tok = db.sample[2]["data"]["LIDAR_TOP"]
        pts, lags = load_multisweep(db, sd_tok, num_sweeps=10)
        single = LidarPointCloud.from_file(db.get_sample_data_path(sd_tok))
        assert len(pts) > len(single)
        assert lags.shape == (len(pts),)
        np.testing.assert_allclose(lags[: len(single)], 0.0)
        assert np.all(lags[len(single) :] > 0)
        # Motion compensation: static ground points from prior sweeps must
        # land at sane heights in the reference frame.
        assert np.all(np.abs(pts[:, 2]) < 60)

    def test_multisweep_motion_compensation_exact(self, db):
        """A GT box cluster from the previous sweep must map into the current
        sensor-frame location of that (static-velocity-corrected) box."""
        sd_tok = db.sample[1]["data"]["LIDAR_TOP"]
        pts, lags = load_multisweep(db, sd_tok, num_sweeps=1)
        boxes_now = db.get_boxes_in_sensor_frame(sd_tok)
        # Previous-sweep points (lag > 0) near where objects were 0.5 s ago:
        # since objects move, just assert the sweep concatenation is framed
        # consistently — all z within lidar height band.
        prev_pts = pts[lags > 0]
        assert prev_pts.shape[0] > 0
        assert np.percentile(prev_pts[:, 2], 5) > -3.0


class TestMapMask:
    def test_mask_and_pixel_coords(self, db):
        mm = MapMask(db.map_mask_path(db.sample[0]["token"]), resolution=0.5)
        assert mm.base_mask.shape == (512, 512)
        # World y=128 (road band center) → on mask; y=10 → off.
        assert mm.is_on_mask([100.0], [128.0])[0]
        assert not mm.is_on_mask([100.0], [10.0])[0]

    def test_dilation_grows(self, db):
        mm = MapMask(db.map_mask_path(db.sample[0]["token"]), resolution=0.5)
        base = (mm.mask() > 0).sum()
        dil = (mm.mask(dilation=2.0) > 0).sum()
        assert dil > base

    def test_crop_around(self, db):
        mm = MapMask(db.map_mask_path(db.sample[0]["token"]), resolution=0.5)
        crop = mm.crop_around((100.0, 128.0), extent_m=60.0)
        assert crop.shape == (120, 120)
        assert crop[60, 60] == 255
        # Crop overlapping the border zero-pads.
        edge = mm.crop_around((2.0, 128.0), extent_m=60.0)
        assert edge.shape == (120, 120)


class TestSplits:
    def test_train_val_split_deterministic(self):
        names = [f"scene_{i:03d}" for i in range(18)]
        a = train_val_split(names)
        b = train_val_split(names)
        assert a == b
        assert len(a["val"]) == 3 and len(a["train"]) == 15
        assert set(a["val"]) | set(a["train"]) == set(names)

    def test_split_parts(self):
        parts = split_parts(list("abcdefghij"), 4)
        assert [len(p) for p in parts] == [3, 3, 2, 2]
        assert sorted(sum(parts, [])) == sorted("abcdefghij")


class TestSlerp:
    def test_slerp_endpoints_and_midpoint(self):
        q0 = quat_from_yaw(0.0)
        q1 = quat_from_yaw(1.0)
        np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
        np.testing.assert_allclose(quat_slerp(q0, q1, 1.0), q1, atol=1e-12)
        mid = quat_slerp(q0, q1, 0.5)
        assert abs(quaternion_yaw(mid) - 0.5) < 1e-9


class TestMapChannelOrientation:
    def test_rotated_ego_sees_vertical_band(self, tmp_path):
        """The map is a horizontal road band (along world x). An ego facing
        +y world (yaw=π/2) must see the band along its own x axis → in the
        ego-frame BEV crop the band crosses COLUMNS near the center row...
        specifically the drivable strip runs along the car's ±y direction,
        i.e. appears as a vertical stripe of columns around the center.
        Validates the rotation sign + flip of map_channel."""
        from lyft3d_tpu.data.bev_pipeline import BEVConfig, BEVSampleGenerator
        from lyft3d_tpu.data.synthetic import make_synthetic_lyft
        from lyft3d_tpu.core.quaternion import quat_from_yaw

        root = make_synthetic_lyft(tmp_path / "rot", num_scenes=1, samples_per_scene=1)
        db = LyftDB(root, root / "data")
        cfg = BEVConfig(shape=(64, 64, 3), voxel_size=(1.0, 1.0, 1.5),
                        map_resolution=0.5)
        gen = BEVSampleGenerator(db, cfg)
        tok = db.sample[0]["token"]

        # yaw = 0: road band along world x → along car x → map rows ~center.
        m0 = gen.map_channel(tok)
        assert m0.sum() > 0
        row_profile = m0.mean(axis=1)  # (H,) band → peak near center rows
        col_profile = m0.mean(axis=0)
        assert row_profile.max() > 0.9  # some rows fully drivable
        assert col_profile.max() < 0.9  # no column fully drivable (band is horizontal)

        # Rotate the ego to face +y world.
        sd_tok = db.get("sample", tok)["data"]["LIDAR_TOP"]
        sd = db.get("sample_data", sd_tok)
        pose = db.get("ego_pose", sd["ego_pose_token"])
        pose["rotation"] = list(map(float, quat_from_yaw(np.pi / 2)))
        m90 = gen.map_channel(tok)
        row_profile = m90.mean(axis=1)
        col_profile = m90.mean(axis=0)
        assert col_profile.max() > 0.9  # band now vertical (along car y cols)
        assert row_profile.max() < 0.9
