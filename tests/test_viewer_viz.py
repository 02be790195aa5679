"""Viewer backend + BEV visualization tests."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.utils.visualize import bev_debug_image, draw_boxes_bev, points_to_bev_image


class TestVisualize:
    def test_points_image(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-40, 40, (5000, 4))
        img = points_to_bev_image(pts)
        assert img.shape == (1000, 1000, 3)
        assert img.max() > 0

    def test_draw_boxes(self):
        img = np.zeros((200, 200, 3), np.uint8)
        boxes = np.array([[0.0, 0.0, 0.0, 4.0, 8.0, 1.5, 0.5]])
        out = draw_boxes_bev(img, boxes, np.array([1]), extent=16.0, resolution=0.16)
        assert out.sum() > 0

    def test_debug_image(self):
        pts = np.random.RandomState(1).uniform(-20, 20, (1000, 3))
        gt = np.array([[0, 0, 0, 2, 4, 1.5, 0.0]])
        det = np.array([[5, 5, 0, 2, 4, 1.5, 1.0]])
        img = bev_debug_image(pts, gt, det)
        assert img.shape[2] == 3


class TestViewerBackend:
    def test_endpoints(self, tmp_path):
        from http.server import ThreadingHTTPServer

        from lyft3d_tpu.serve import viewer as v

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1, samples_per_scene=2)
        server = ThreadingHTTPServer(("127.0.0.1", 0), v.Handler)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/load_dataset",
                data=json.dumps({"data_root": str(root)}).encode(),
                method="POST",
            )
            resp = json.loads(urllib.request.urlopen(req).read())
            assert resp["ok"] and resp["num_samples"] == 2

            tokens = json.loads(
                urllib.request.urlopen(f"http://127.0.0.1:{port}/api/samples").read()
            )["tokens"]
            assert len(tokens) == 2

            sample = json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/sample?token={tokens[0]}&max_points=500"
                ).read()
            )
            assert len(sample["points"]) == 500
            assert len(sample["gt_boxes"]) == 6

            img = json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/bev_image?token={tokens[0]}"
                ).read()
            )
            png = base64.b64decode(img["png_base64"])
            assert png[:4] == b"\x89PNG"
        finally:
            server.shutdown()

    def test_frontend_model_and_detect(self, tmp_path):
        """/ serves the embedded frontend; load_model + detect run the BEV
        pipeline (reference viewer's buildNet/inference endpoints)."""
        from http.server import ThreadingHTTPServer

        from lyft3d_tpu.serve import viewer as v

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1, samples_per_scene=1)
        server = ThreadingHTTPServer(("127.0.0.1", 0), v.Handler)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"
        try:
            page = urllib.request.urlopen(base + "/").read().decode()
            assert "lyft3d_tpu viewer" in page and "canvas" in page

            # detect before model load → JSON error payload (HTTP 500)
            try:
                urllib.request.urlopen(base + "/api/detect?token=x")
                assert False, "expected HTTP error"
            except urllib.error.HTTPError as e:
                assert "error" in json.loads(e.fp.read())

            req = urllib.request.Request(
                base + "/api/load_dataset",
                data=json.dumps({"data_root": str(root)}).encode(), method="POST",
            )
            assert json.loads(urllib.request.urlopen(req).read())["ok"]
            tokens = json.loads(urllib.request.urlopen(base + "/api/samples").read())["tokens"]

            req = urllib.request.Request(
                base + "/api/load_model",
                data=json.dumps({"model": "unet_reference"}).encode(), method="POST",
            )
            resp = json.loads(urllib.request.urlopen(req).read())
            assert resp["ok"] and resp["model"] == "unet_reference"

            det = json.loads(
                urllib.request.urlopen(base + f"/api/detect?token={tokens[0]}").read()
            )
            assert det["token"] == tokens[0]
            assert isinstance(det["boxes_world"], list)
            assert isinstance(det["boxes_sensor"], list)
            for b in det["boxes_sensor"]:
                assert len(b["box"]) == 7 and 0.0 <= b["score"] <= 1.0
        finally:
            server.shutdown()


class TestCameraProjection:
    """Explorer camera paths: map_pointcloud_to_image (lyftdataset.py:730)."""

    def test_project_and_render(self, tmp_path):
        from lyft3d_tpu.data.lyftdb import LyftDB
        from lyft3d_tpu.utils.visualize import (
            map_pointcloud_to_image,
            render_pointcloud_in_image,
        )

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1, samples_per_scene=2)
        db = LyftDB(root, root / "data")
        sample = db.sample[0]
        cam_token = sample["data"]["CAM_FRONT"]
        pts_token = sample["data"]["LIDAR_TOP"]
        uv, depths, image = map_pointcloud_to_image(db, pts_token, cam_token)
        assert uv.shape[0] == 2 and uv.shape[1] == depths.shape[0]
        assert image.ndim == 3 and image.shape[2] == 3
        # some forward points must land on the canvas, all inside it
        assert depths.size > 0 and (depths > 1.0).all()
        assert (uv[0] >= 0).all() and (uv[0] <= image.shape[1]).all()
        assert (uv[1] >= 0).all() and (uv[1] <= image.shape[0]).all()

        img = render_pointcloud_in_image(db, sample["token"])
        assert img.shape == image.shape
        assert (img != image).any()  # dots drawn

    def test_render_boxes_in_image(self, tmp_path):
        """Camera branch of render_sample_data (lyftdataset.py:934): GT
        boxes projected and drawn onto the camera image."""
        import numpy as np

        from lyft3d_tpu.core.box import Box
        from lyft3d_tpu.data.lyftdb import LyftDB
        from lyft3d_tpu.utils.visualize import render_boxes_in_image

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1, samples_per_scene=2)
        db = LyftDB(root, root / "data")
        sample = db.sample[0]
        plain = render_boxes_in_image(db, sample["token"], boxes=[])
        img = render_boxes_in_image(
            db, sample["token"],
            # A box straight ahead of the camera (camera frame: +z forward).
            boxes=[Box(center=[0.0, 0.0, 8.0], wlh=[2.0, 4.0, 1.6],
                       orientation=[1.0, 0, 0, 0])],
            color=(255, 0, 0),
        )
        assert img.shape == plain.shape
        diff = (img.astype(int) - plain.astype(int)) != 0
        assert diff.any()  # edges drawn
        # drawn in the requested color (red channel dominates changed px)
        changed = np.argwhere(diff.any(-1))
        assert len(changed) > 50

        # annotation path: uses the db's GT boxes in the camera frame
        ann = render_boxes_in_image(db, sample["token"])
        assert ann.shape == plain.shape
