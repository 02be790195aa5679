"""BEV sample pipeline: Lyft DB sample → model input / target / map arrays.

Capability of the reference's offline BEV generation
(``generating-dataset/generating_train_bev.py:175-233``:
``prepare_training_data_for_scene`` — lidar→car frame, voxel rasterization,
GT box drawing at 0.8 scale, ego-centered rotated map crop), re-designed so
the rasterization itself runs on device (``ops.bev_raster``) and the host
only does IO + pose math. PNG round-trips are optional (the reference always
materializes PNGs; we can feed the device directly).

Canonical class order (index = position + 1; 0 is background) matches the
reference list (generating_train_bev.py:239).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from lyft3d_tpu.core.box import Box
from lyft3d_tpu.core.quaternion import quat_inverse, quaternion_yaw
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.map_mask import MapMask
from lyft3d_tpu.data.pointcloud import LidarPointCloud, load_multisweep

BEV_CLASSES = (
    "car",
    "motorcycle",
    "bus",
    "bicycle",
    "truck",
    "pedestrian",
    "other_vehicle",
    "animal",
    "emergency_vehicle",
)

# Per-class fixed box heights used when lifting BEV boxes back to 3D
# (unet-inference-with-map.py:305-312).
CLASS_HEIGHTS = {
    "car": 1.75,
    "motorcycle": 1.47,
    "bus": 3.44,
    "bicycle": 1.44,
    "truck": 3.44,
    "pedestrian": 1.78,
    "other_vehicle": 3.23,
    "animal": 0.51,
    "emergency_vehicle": 2.39,
}


@dataclass
class BEVConfig:
    shape: Tuple[int, int, int] = (336, 336, 3)
    voxel_size: Tuple[float, float, float] = (0.4, 0.4, 1.5)
    z_offset: float = -2.0
    box_scale: float = 0.8
    max_points: int = 131072  # fixed device buffer capacity
    num_sweeps: int = 1
    map_resolution: float = 0.1
    classes: Tuple[str, ...] = BEV_CLASSES

    @property
    def extent_m(self) -> Tuple[float, float]:
        return (
            self.shape[1] * self.voxel_size[0],
            self.shape[0] * self.voxel_size[1],
        )


class BEVSampleGenerator:
    """Produces fixed-capacity arrays for one sample token."""

    def __init__(self, db: LyftDB, config: BEVConfig = BEVConfig()):
        self.db = db
        self.cfg = config
        self._map_masks: Dict[str, MapMask] = {}

    # -- points -------------------------------------------------------------
    def points_in_car_frame(self, sample_token: str) -> np.ndarray:
        """(max_points, 4) padded [x, y, z, time_lag] in the EGO frame +
        validity encoded by time_lag >= 0 (padding rows get lag −1)."""
        cfg = self.cfg
        sd_token = self.db.get("sample", sample_token)["data"]["LIDAR_TOP"]
        if cfg.num_sweeps > 1:
            pts, lags = load_multisweep(self.db, sd_token, num_sweeps=cfg.num_sweeps - 1)
        else:
            pc = LidarPointCloud.from_file(self.db.get_sample_data_path(sd_token))
            pts, lags = pc.points, np.zeros(len(pc.points), np.float32)
        # sensor → car
        car_from_sensor = self.db.sensor_pose_matrix(sd_token)
        xyz = pts[:, :3] @ car_from_sensor[:3, :3].T.astype(np.float32) + car_from_sensor[
            :3, 3
        ].astype(np.float32)

        out = np.full((cfg.max_points, 4), -1.0, dtype=np.float32)
        n = min(len(xyz), cfg.max_points)
        out[:n, :3] = xyz[:n]
        out[:n, 3] = lags[:n]
        return out

    # -- boxes ----------------------------------------------------------------
    def boxes_in_car_frame(self, sample_token: str) -> List[Box]:
        """GT boxes world → ego frame (move_boxes_to_car_space:107)."""
        sd_token = self.db.get("sample", sample_token)["data"]["LIDAR_TOP"]
        sd = self.db.get("sample_data", sd_token)
        pose = self.db.get("ego_pose", sd["ego_pose_token"])
        boxes = self.db.get_boxes(sd_token)
        for box in boxes:
            box.translate(-np.asarray(pose["translation"]))
            box.rotate(quat_inverse(pose["rotation"]))
        return boxes

    def box_corners_px(
        self, sample_token: str, max_boxes: int = 64
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """GT boxes → (max_boxes, 4, 2) scaled bottom-corner pixel coords,
        (max_boxes,) class ids (1-based), (max_boxes,) valid mask."""
        cfg = self.cfg
        h, w, _ = cfg.shape
        corners = np.zeros((max_boxes, 4, 2), dtype=np.float32)
        classes = np.zeros(max_boxes, dtype=np.int32)
        valid = np.zeros(max_boxes, dtype=bool)
        for i, box in enumerate(self.boxes_in_car_frame(sample_token)[:max_boxes]):
            if box.name not in cfg.classes:
                continue
            bc = box.bottom_corners(wlh_factor=cfg.box_scale)  # (3, 4)
            px = bc[0] / cfg.voxel_size[0] + w / 2.0
            py = bc[1] / cfg.voxel_size[1] + h / 2.0
            corners[i, :, 0] = px
            corners[i, :, 1] = py
            classes[i] = cfg.classes.index(box.name) + 1
            valid[i] = True
        return corners, classes, valid

    # -- map -------------------------------------------------------------------
    def map_channel(self, sample_token: str) -> np.ndarray:
        """(H, W) float32 in [0,1]: drivable-surface crop around the ego,
        rotated so the ego heading is fixed (get_semantic_map_around_ego:141).

        The BEV grid has +x to the right and +y up the rows in ego frame; map
        pixels have +y downward, so the crop is vertically flipped after
        rotation.
        """
        cfg = self.cfg
        h, w, _ = cfg.shape
        path = self.db.map_mask_path(sample_token)
        if path is None or not path.exists():
            return np.zeros((h, w), dtype=np.float32)
        key = str(path)
        if key not in self._map_masks:
            self._map_masks[key] = MapMask(path, resolution=cfg.map_resolution)
        mm = self._map_masks[key]

        sd_token = self.db.get("sample", sample_token)["data"]["LIDAR_TOP"]
        sd = self.db.get("sample_data", sd_token)
        pose = self.db.get("ego_pose", sd["ego_pose_token"])
        yaw = quaternion_yaw(np.asarray(pose["rotation"]))

        ext_x, ext_y = cfg.extent_m
        big = mm.crop_around(pose["translation"][:2], extent_m=ext_x * np.sqrt(2.0))

        import cv2

        center = (big.shape[1] / 2.0, big.shape[0] / 2.0)
        # Map rows grow downward while world y grows upward, so a world yaw
        # rotates the raster by -yaw... combined with the final flip this is
        # +yaw in image coords; rotate so ego heading points along +x cols.
        rot = cv2.getRotationMatrix2D(center, -np.degrees(yaw), 1.0)
        rotated = cv2.warpAffine(big, rot, (big.shape[1], big.shape[0]))
        half_px = int(round(ext_x / 2.0 / mm.resolution))
        cy, cx = big.shape[0] // 2, big.shape[1] // 2
        crop = rotated[cy - half_px : cy + half_px, cx - half_px : cx + half_px]
        crop = cv2.resize(crop, (w, h), interpolation=cv2.INTER_NEAREST)
        return np.flipud(crop).astype(np.float32) / 255.0

    # -- full sample --------------------------------------------------------------
    def sample_arrays(self, sample_token: str, max_boxes: int = 64) -> Dict[str, np.ndarray]:
        """Everything the device needs for one sample (all fixed shapes)."""
        points = self.points_in_car_frame(sample_token)
        corners, classes, valid = self.box_corners_px(sample_token, max_boxes)
        return {
            "points": points,
            "points_valid": points[:, 3] >= 0.0,
            "box_corners_px": corners,
            "box_classes": classes,
            "box_valid": valid,
            "map": self.map_channel(sample_token),
        }

    # -- inverse (inference → world) ------------------------------------------
    def pixels_to_car(self, px: np.ndarray, py: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        h, w, _ = cfg.shape
        x = (px - w / 2.0) * cfg.voxel_size[0]
        y = (py - h / 2.0) * cfg.voxel_size[1]
        return x, y

    def car_to_world_matrix(self, sample_token: str) -> np.ndarray:
        sd_token = self.db.get("sample", sample_token)["data"]["LIDAR_TOP"]
        return self.db.ego_pose_matrix(sd_token)

    def ego_height(self, sample_token: str) -> float:
        sd_token = self.db.get("sample", sample_token)["data"]["LIDAR_TOP"]
        sd = self.db.get("sample_data", sd_token)
        return float(self.db.get("ego_pose", sd["ego_pose_token"])["translation"][2])
