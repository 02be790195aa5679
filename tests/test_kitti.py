"""KITTI interop tests: calibration round-trips, label IO, lidar↔camera box
conversion, Lyft→KITTI export, and the 41-pt AP evaluator."""

import numpy as np
import pytest

from lyft3d_tpu.data.kitti import (
    Calibration,
    Object3d,
    box_camera_to_lidar,
    box_lidar_to_camera,
    default_calibration,
    export_kitti,
    read_label_file,
    write_label_file,
)
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.pointcloud import LidarPointCloud
from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.eval.kitti_eval import evaluate_kitti, kitti_ap, recall_at


class TestCalibration:
    def test_file_roundtrip(self, tmp_path):
        calib = default_calibration()
        calib.to_file(tmp_path / "c.txt")
        back = Calibration.from_file(tmp_path / "c.txt")
        np.testing.assert_allclose(back.p2, calib.p2)
        np.testing.assert_allclose(back.tr_velo_to_cam, calib.tr_velo_to_cam)

    def test_lidar_rect_roundtrip(self):
        calib = default_calibration()
        rng = np.random.RandomState(0)
        pts = rng.randn(50, 3)
        back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_axis_convention(self):
        calib = default_calibration()
        # Lidar forward (+x) → camera forward (+z).
        rect = calib.lidar_to_rect(np.array([[10.0, 0.0, 0.0]]))
        np.testing.assert_allclose(rect[0], [0.0, 0.0, 10.0], atol=1e-12)

    def test_projection(self):
        calib = default_calibration()
        uv, depth = calib.rect_to_img(np.array([[0.0, 0.0, 10.0]]))
        np.testing.assert_allclose(uv[0], [600.0, 300.0])  # principal point
        assert depth[0] == 10.0


class TestBoxConversion:
    def test_lidar_camera_roundtrip(self):
        calib = default_calibration()
        rng = np.random.RandomState(1)
        for _ in range(20):
            box = np.array(
                [
                    rng.uniform(-20, 20), rng.uniform(-20, 20), rng.uniform(-2, 1),
                    rng.uniform(1, 3), rng.uniform(2, 6), rng.uniform(1, 3),
                    rng.uniform(-np.pi, np.pi),
                ]
            )
            pos, ry = box_lidar_to_camera(box, calib)
            back = box_camera_to_lidar(pos, (box[5], box[3], box[4]), ry, calib)
            np.testing.assert_allclose(back[:6], box[:6], atol=1e-9)
            assert abs(np.angle(np.exp(1j * (back[6] - box[6])))) < 1e-9


class TestLabels:
    def test_label_roundtrip(self, tmp_path):
        obj = Object3d(
            cls_type="car", truncation=0.1, occlusion=1, alpha=-0.5,
            box2d=np.array([10.0, 20.0, 200.0, 150.0]),
            h=1.5, w=1.8, l=4.2, pos=np.array([1.0, 1.5, 20.0]), ry=0.3, score=0.77,
        )
        write_label_file(tmp_path / "l.txt", [obj])
        back = read_label_file(tmp_path / "l.txt")[0]
        assert back.cls_type == "car"
        np.testing.assert_allclose(back.pos, obj.pos, atol=0.01)
        assert abs(back.score - 0.77) < 1e-3

    def test_difficulty_rules(self):
        def mk(height, trunc, occ):
            return Object3d("car", trunc, occ, 0, np.array([0, 0, 10.0, height]),
                            1.5, 1.8, 4, np.zeros(3), 0.0)

        assert mk(50, 0.0, 0).difficulty == 0
        assert mk(30, 0.2, 1).difficulty == 1
        assert mk(26, 0.4, 2).difficulty == 2
        assert mk(10, 0.9, 3).difficulty == -1


class TestExport:
    def test_export_tree(self, tmp_path):
        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1,
                                   samples_per_scene=2, classes=["car", "truck"])
        db = LyftDB(root, root / "data")
        out = export_kitti(db, tmp_path / "kitti")
        bins = sorted((out / "velodyne").glob("*.bin"))
        labels = sorted((out / "label_2").glob("*.txt"))
        assert len(bins) == 2 and len(labels) == 2
        objs = read_label_file(labels[0])
        assert len(objs) > 0
        calib = Calibration.from_file(out / "calib" / "000000.txt")
        # Label boxes convert back to lidar frame and match the DB boxes.
        sd_tok = db.sample[0]["data"]["LIDAR_TOP"]
        gt = {b.token: b for b in db.get_boxes_in_sensor_frame(sd_tok)}
        back0 = box_camera_to_lidar(objs[0].pos, (objs[0].h, objs[0].w, objs[0].l),
                                    objs[0].ry, calib)
        dists = [np.linalg.norm(back0[:3] - b.center) for b in gt.values()]
        assert min(dists) < 0.02


def frame(boxes, names, scores=None, difficulty=None):
    d = {"boxes": np.asarray(boxes, np.float64).reshape(-1, 7),
         "names": np.asarray(names)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float64)
    if difficulty is not None:
        d["difficulty"] = np.asarray(difficulty)
    return d


class TestKittiAP:
    def test_perfect_detection(self):
        gt = [frame([[0, 0, 0, 2, 4, 1.6, 0.3]], ["car"], difficulty=[0])]
        det = [frame([[0, 0, 0, 2, 4, 1.6, 0.3]], ["car"], scores=[0.9])]
        assert kitti_ap(gt, det, "car", 0.7, "3d", 1) == pytest.approx(1.0)
        assert recall_at(gt, det, "car", 0.7) == 1.0

    def test_miss_gives_zero(self):
        gt = [frame([[0, 0, 0, 2, 4, 1.6, 0.0]], ["car"], difficulty=[0])]
        det = [frame([[30, 30, 0, 2, 4, 1.6, 0.0]], ["car"], scores=[0.9])]
        assert kitti_ap(gt, det, "car", 0.7, "3d", 1) == 0.0

    def test_difficulty_buckets(self):
        # Hard GT excluded from the easy bucket: detecting it neither helps
        # nor hurts; missing it doesn't count against recall.
        gt = [frame([[0, 0, 0, 2, 4, 1.6, 0], [10, 0, 0, 2, 4, 1.6, 0]],
                    ["car", "car"], difficulty=[0, 2])]
        det = [frame([[0, 0, 0, 2, 4, 1.6, 0]], ["car"], scores=[0.9])]
        assert kitti_ap(gt, det, "car", 0.7, "3d", difficulty=0) == pytest.approx(1.0)
        # In the hard bucket the second GT counts → recall 0.5.
        ap_hard = kitti_ap(gt, det, "car", 0.7, "3d", difficulty=2)
        assert 0.4 < ap_hard < 0.6

    def test_bev_vs_3d(self):
        # Same footprint, vertical offset: BEV match, 3D miss.
        gt = [frame([[0, 0, 0, 2, 4, 1.6, 0]], ["car"], difficulty=[0])]
        det = [frame([[0, 0, 1.4, 2, 4, 1.6, 0]], ["car"], scores=[0.9])]
        assert kitti_ap(gt, det, "car", 0.7, "bev", 1) == pytest.approx(1.0)
        assert kitti_ap(gt, det, "car", 0.7, "3d", 1) == 0.0

    def test_evaluate_table(self):
        gt = [frame([[0, 0, 0, 2, 4, 1.6, 0]], ["car"], difficulty=[0])]
        det = [frame([[0.05, 0, 0, 2, 4, 1.6, 0]], ["car"], scores=[0.8])]
        table = evaluate_kitti(gt, det, ["car", "pedestrian"])
        assert set(table) == {"car", "pedestrian"}
        assert len(table["car"]["3d"]) == 3
        assert table["car"]["bev"][1] > 0.9
        assert table["pedestrian"]["3d"][0] == 0.0


class TestCameraExport:
    def test_image2_and_real_calibration(self, tmp_path):
        """image_2 PNGs + real P2/Tr_velo_to_cam when the dataset has a
        camera (export_kitti.py:126-249 image/calib capability)."""
        import numpy as np

        from lyft3d_tpu.data.kitti import Calibration, export_kitti
        from lyft3d_tpu.data.lyftdb import LyftDB
        from lyft3d_tpu.data.synthetic import make_synthetic_lyft

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1,
                                   samples_per_scene=2, classes=["car"])
        db = LyftDB(root, root / "data")
        out = export_kitti(db, tmp_path / "kitti")

        imgs = sorted((out / "image_2").glob("*.png"))
        assert len(imgs) == 2

        calib = Calibration.from_file(out / "calib" / "000000.txt")
        # P2 carries the synthetic camera intrinsics (fx=fy=50, cx=32, cy=24).
        assert np.allclose(calib.p2[0, 0], 50.0) and np.allclose(calib.p2[0, 2], 32.0)
        # Tr maps lidar +x (forward) to camera +z (optical axis): the lidar
        # sits at z=1.8 on the ego, camera at x=1.5, z=1.5.
        fwd = calib.tr_velo_to_cam @ np.array([10.0, 0.0, 0.0, 1.0])
        assert fwd[2] > 8.0  # well in front of the camera
        assert abs(fwd[0]) < 1.0  # near the optical axis

    def test_lidar_only_dataset_still_exports(self, tmp_path):
        """No camera → default calibration, no image_2 (old behavior)."""
        import json

        from lyft3d_tpu.data.kitti import export_kitti
        from lyft3d_tpu.data.lyftdb import LyftDB
        from lyft3d_tpu.data.synthetic import make_synthetic_lyft

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1,
                                   samples_per_scene=1)
        # strip the camera rows to simulate a lidar-only dataset
        sd = json.loads((root / "data" / "sample_data.json").read_text())
        sd = [r for r in sd if r["calibrated_sensor_token"] != "cs_cam"]
        (root / "data" / "sample_data.json").write_text(json.dumps(sd))
        db = LyftDB(root, root / "data")
        out = export_kitti(db, tmp_path / "kitti")
        assert (out / "velodyne" / "000000.bin").exists()
        assert not (out / "image_2").exists()
