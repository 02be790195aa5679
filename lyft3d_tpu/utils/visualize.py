"""BEV debug visualization.

Capability of the reference's debug drawing (``second/second/utils/
simplevis.py`` point-cloud→BEV image with GT/det boxes; ``bbox_plot.py``)
and the SDK's render helpers: rasterize points to a grayscale BEV image and
draw rotated boxes with cv2 polylines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["points_to_bev_image", "draw_boxes_bev", "bev_debug_image"]

_CLASS_COLORS = [
    (0, 255, 0), (255, 128, 0), (0, 128, 255), (255, 0, 255), (255, 255, 0),
    (128, 255, 128), (0, 0, 255), (255, 0, 0), (128, 0, 255), (0, 255, 255),
]


def points_to_bev_image(
    points: np.ndarray,
    extent: float = 80.0,
    resolution: float = 0.16,
) -> np.ndarray:
    """(N, ≥2) points → (H, W, 3) uint8 intensity image (ego centered)."""
    size = int(round(2 * extent / resolution))
    img = np.zeros((size, size), np.float32)
    col = np.floor(points[:, 0] / resolution + size / 2).astype(np.int64)
    row = np.floor(points[:, 1] / resolution + size / 2).astype(np.int64)
    ok = (col >= 0) & (col < size) & (row >= 0) & (row < size)
    np.add.at(img, (row[ok], col[ok]), 1.0)
    img = np.clip(img / 4.0, 0, 1)
    return np.repeat((img * 255).astype(np.uint8)[..., None], 3, axis=-1)


def draw_boxes_bev(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: Optional[np.ndarray] = None,
    extent: float = 80.0,
    resolution: float = 0.16,
    thickness: int = 1,
) -> np.ndarray:
    """Draw (B, 7) [x,y,z,w,l,h,yaw] boxes onto a BEV image in place."""
    import cv2

    size = image.shape[0]
    for i, b in enumerate(np.asarray(boxes).reshape(-1, 7)):
        x, y, w, l, yaw = b[0], b[1], b[3], b[4], b[6]
        c, s = np.cos(yaw), np.sin(yaw)
        lx = np.array([l, -l, -l, l]) / 2
        wy = np.array([w, w, -w, -w]) / 2
        px = (c * lx - s * wy + x) / resolution + size / 2
        py = (s * lx + c * wy + y) / resolution + size / 2
        poly = np.round(np.stack([px, py], -1)).astype(np.int32)
        ci = int(classes[i]) % len(_CLASS_COLORS) if classes is not None else 0
        cv2.polylines(image, [poly], True, _CLASS_COLORS[ci], thickness)
        # Heading tick from center to the +x face.
        cx, cy = x / resolution + size / 2, y / resolution + size / 2
        hx, hy = (x + c * l / 2) / resolution + size / 2, (y + s * l / 2) / resolution + size / 2
        cv2.line(image, (int(cx), int(cy)), (int(hx), int(hy)), _CLASS_COLORS[ci], thickness)
    return image


def bev_debug_image(points, gt_boxes=None, det_boxes=None, extent=80.0,
                    resolution=0.16) -> np.ndarray:
    """One-call debug view: points gray, GT green-family, dets red-family."""
    img = points_to_bev_image(points, extent, resolution)
    if gt_boxes is not None and len(gt_boxes):
        draw_boxes_bev(img, gt_boxes, np.zeros(len(gt_boxes), int), extent, resolution)
    if det_boxes is not None and len(det_boxes):
        draw_boxes_bev(img, det_boxes, np.full(len(det_boxes), 7, int), extent, resolution)
    return img
