"""Golden-value tests for the official Lyft mAP metric.

Covers the same behavioral surface as the reference's metric tests
(nuscenes-devkit/tests/test_map.py): exact IoUs of constructed rotated boxes,
PR/AP behavior for perfect / partial / empty prediction sets, and
cross-checks the numpy IoU clipper against the jnp/device one.
"""

import numpy as np
import jax.numpy as jnp

from lyft3d_tpu.core.quaternion import quat_from_yaw
from lyft3d_tpu.eval.map_eval import (
    evaluate_map,
    get_ap,
    get_average_precisions,
)
from lyft3d_tpu.eval.np_rotated_iou import iou_3d_np, iou_bev_np
from lyft3d_tpu.ops.rotated_iou import rotated_iou_3d, rotated_iou_bev


def rec(sample, name, x, y, z, w, l, h, yaw, score=None):
    r = {
        "sample_token": sample,
        "translation": [x, y, z],
        "size": [w, l, h],
        "rotation": list(quat_from_yaw(yaw)),
        "name": name,
    }
    if score is not None:
        r["score"] = score
    return r


class TestNpIoU:
    def test_matches_jnp_bev(self):
        rng = np.random.RandomState(21)
        b1 = np.column_stack(
            [
                rng.uniform(-3, 3, 20),
                rng.uniform(-3, 3, 20),
                rng.uniform(1, 4, 20),
                rng.uniform(1, 4, 20),
                rng.uniform(-np.pi, np.pi, 20),
            ]
        )
        b2 = b1 + rng.uniform(-0.5, 0.5, b1.shape)
        got = iou_bev_np(b1, b2)
        want = np.asarray(rotated_iou_bev(jnp.array(b1, jnp.float32), jnp.array(b2, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_matches_jnp_3d(self):
        rng = np.random.RandomState(22)
        b1 = np.column_stack(
            [
                rng.uniform(-3, 3, 10),
                rng.uniform(-3, 3, 10),
                rng.uniform(-1, 1, 10),
                rng.uniform(1, 4, 10),
                rng.uniform(1, 4, 10),
                rng.uniform(1, 3, 10),
                rng.uniform(-np.pi, np.pi, 10),
            ]
        )
        b2 = b1 + rng.uniform(-0.3, 0.3, b1.shape)
        got = iou_3d_np(b1, b2)
        want = np.asarray(rotated_iou_3d(jnp.array(b1, jnp.float32), jnp.array(b2, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_golden_half_overlap(self):
        b1 = np.array([[0, 0, 0, 2, 2, 2, 0.0]])
        b2 = np.array([[1, 0, 0, 2, 2, 2, 0.0]])
        np.testing.assert_allclose(iou_3d_np(b1, b2), [[1 / 3]], atol=1e-9)

    def test_empty(self):
        assert iou_3d_np(np.zeros((0, 7)), np.ones((3, 7))).shape == (0, 3)


class TestAP:
    def test_perfect_pr(self):
        ap = get_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
        assert abs(ap - 1.0) < 1e-9

    def test_half_recall_perfect_precision(self):
        ap = get_ap(np.array([0.25, 0.5]), np.array([1.0, 1.0]))
        assert abs(ap - 0.5) < 1e-9

    def test_envelope(self):
        # Precision dips then recovers: envelope should use the max to the right.
        ap = get_ap(np.array([0.5, 0.5, 1.0]), np.array([1.0, 0.5, 2 / 3]))
        assert abs(ap - (0.5 * 1.0 + 0.5 * (2 / 3))) < 1e-9


class TestMAP:
    def test_perfect_predictions(self):
        gt = [
            rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.2),
            rec("s0", "car", 10, 0, 0, 2, 4, 1.5, -0.4),
            rec("s1", "pedestrian", 5, 5, 0, 0.8, 0.8, 1.8, 0.0),
        ]
        preds = [dict(g, score=0.9) for g in gt]
        overall, per_class = evaluate_map(gt, preds)
        assert abs(overall - 1.0) < 1e-9
        assert abs(per_class["car"][0.5] - 1.0) < 1e-9

    def test_no_predictions(self):
        gt = [rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0)]
        overall, _ = evaluate_map(gt, [])
        assert overall == 0.0

    def test_false_positive_halves_precision(self):
        gt = [rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0)]
        preds = [
            rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0, score=0.9),
            rec("s0", "car", 50, 50, 0, 2, 4, 1.5, 0.0, score=0.8),
        ]
        aps = get_average_precisions(gt, preds, ["car"], 0.5)
        # TP first (recall 1, precision 1), then FP → AP stays 1.0.
        assert abs(aps[0] - 1.0) < 1e-9
        # FP first (higher score) → precision at recall 1 is 0.5.
        preds[1]["score"] = 0.99
        aps = get_average_precisions(gt, preds, ["car"], 0.5)
        assert abs(aps[0] - 0.5) < 1e-9

    def test_iou_threshold_gates_match(self):
        gt = [rec("s0", "car", 0, 0, 0, 2, 2, 2, 0.0)]
        # Offset 1m → IoU 1/3: match at 0.3, not at 0.5.
        preds = [rec("s0", "car", 1, 0, 0, 2, 2, 2, 0.0, score=0.9)]
        assert get_average_precisions(gt, preds, ["car"], 0.30)[0] == 1.0
        assert get_average_precisions(gt, preds, ["car"], 0.50)[0] == 0.0

    def test_gt_matched_once(self):
        gt = [rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0)]
        preds = [
            rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0, score=0.9),
            rec("s0", "car", 0.05, 0, 0, 2, 4, 1.5, 0.0, score=0.8),
        ]
        r = get_average_precisions(gt, preds, ["car"], 0.5)
        # Second pred is a duplicate → FP; AP still 1.0 (TP came first).
        assert abs(r[0] - 1.0) < 1e-9

    def test_cross_sample_isolation(self):
        # A prediction in the wrong sample must not match GT elsewhere.
        gt = [rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0)]
        preds = [rec("s1", "car", 0, 0, 0, 2, 4, 1.5, 0.0, score=0.9)]
        assert get_average_precisions(gt, preds, ["car"], 0.5)[0] == 0.0

    def test_class_isolation(self):
        gt = [rec("s0", "car", 0, 0, 0, 2, 4, 1.5, 0.0)]
        preds = [rec("s0", "truck", 0, 0, 0, 2, 4, 1.5, 0.0, score=0.9)]
        aps = get_average_precisions(gt, preds, ["car", "truck"], 0.5)
        assert aps.tolist() == [0.0, 0.0]

    def test_threshold_sweep_monotone(self):
        rng = np.random.RandomState(31)
        gt, preds = [], []
        for i in range(30):
            x, y = rng.uniform(-30, 30, 2)
            yaw = rng.uniform(-np.pi, np.pi)
            gt.append(rec("s0", "car", x, y, 0, 2, 4.5, 1.6, yaw))
            preds.append(
                rec(
                    "s0",
                    "car",
                    x + rng.normal(0, 0.25),
                    y + rng.normal(0, 0.25),
                    0,
                    2,
                    4.5,
                    1.6,
                    yaw + rng.normal(0, 0.05),
                    score=rng.uniform(0.5, 1.0),
                )
            )
        aps = [
            get_average_precisions(gt, preds, ["car"], t)[0]
            for t in np.arange(0.5, 1.0, 0.05)
        ]
        assert all(a1 >= a2 - 1e-9 for a1, a2 in zip(aps, aps[1:]))
        assert aps[0] > 0.5


class TestReferenceFixtures:
    """Golden parity against the reference SDK's committed metric fixtures
    (nuscenes-devkit/tests/test_jsons — read in place, never copied)."""

    FIXTURES = "/root/reference/nuscenes-devkit/tests/test_jsons"

    def _load(self, name):
        import json
        from pathlib import Path

        p = Path(self.FIXTURES) / name
        if not p.exists():
            import pytest

            pytest.skip("reference fixtures not available")
        with open(p) as f:
            return json.load(f)

    def _map(self, gt, preds, iou):
        import numpy as np

        from lyft3d_tpu.eval.map_eval import get_average_precisions

        classes = sorted({r["name"] for r in gt})
        aps = get_average_precisions(gt, preds, classes, iou)
        return float(np.mean(aps))

    def test_identity_predictions_score_one(self):
        """test_map.py test_ground_truth: predictions == GT → mAP 1 at every
        IoU threshold."""
        for gt_name, pred_name in [
            ("true_gt.json", "test_file_for_true_result.json"),
            ("all_class_gt.json", "test_file_with_all_classes.json"),
        ]:
            gt = self._load(gt_name)
            preds = self._load(pred_name)
            for iou in (0.05, 0.25, 0.5, 0.75, 0.95):
                assert self._map(gt, preds, iou) == 1.0, (gt_name, iou)

    def test_samples_merged_itself(self):
        """test_map.py test_itself: a class matched against itself → AP 1."""
        boxes = self._load("samples_merged.json")
        for b in boxes:
            b["score"] = 1
        import numpy as np

        from lyft3d_tpu.eval.map_eval import get_average_precisions

        cars_gt = [b for b in boxes if b["name"] == "car"]
        for iou in (0.1, 0.5, 0.9):
            aps = get_average_precisions(cars_gt, cars_gt, ["car"], iou)
            assert float(aps[0]) == 1.0
