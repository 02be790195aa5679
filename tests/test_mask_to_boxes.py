"""Tests for on-device connected components and mask→rotated-box extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops.connected_components import connected_components, morph_open
from lyft3d_tpu.ops.mask_to_boxes import extract_detections, mask_to_rotated_boxes


def labels_np(labels, fg):
    """Normalize device labels to sets of component pixel-sets."""
    lab = np.asarray(labels)
    comps = {}
    h, w = lab.shape
    for r in range(h):
        for c in range(w):
            if np.asarray(fg)[r, c]:
                comps.setdefault(int(lab[r, c]), set()).add((r, c))
    return sorted(comps.values(), key=lambda s: min(s))


class TestConnectedComponents:
    def test_two_blobs(self):
        fg = np.zeros((16, 16), bool)
        fg[2:5, 2:5] = True
        fg[10:14, 9:15] = True
        comps = labels_np(connected_components(jnp.array(fg)), fg)
        assert len(comps) == 2
        assert {(2, 2), (4, 4)} <= comps[0]
        assert {(10, 9), (13, 14)} <= comps[1]

    def test_diagonal_is_connected(self):
        # 8-connectivity: a diagonal chain is one component.
        fg = np.zeros((8, 8), bool)
        for i in range(6):
            fg[i, i] = True
        comps = labels_np(connected_components(jnp.array(fg)), fg)
        assert len(comps) == 1

    def test_long_snake_converges(self):
        # Serpentine path ~ 200 px long: path compression must still converge.
        fg = np.zeros((20, 20), bool)
        for r in range(20):
            fg[r, :] = True
            if r % 2 == 0:
                fg[r, 0] = fg[r, 1] = False if r > 0 else fg[r, 0]
        fg[0, :] = True
        comps = labels_np(connected_components(jnp.array(fg), sweeps=16, compress_rounds=6), fg)
        assert len(comps) == 1

    def test_empty(self):
        fg = jnp.zeros((8, 8), bool)
        lab = np.asarray(connected_components(fg))
        assert np.all(lab == 64)


class TestMorphOpen:
    def test_removes_isolated_pixels(self):
        fg = np.zeros((12, 12), bool)
        fg[3, 3] = True  # speck: erosion kills it
        fg[6:10, 6:10] = True  # solid blob survives opening
        out = np.asarray(morph_open(jnp.array(fg)))
        assert not out[3, 3]
        assert out[7, 7] and out[8, 8]

    def test_blob_shrink_then_restore(self):
        fg = np.zeros((16, 16), bool)
        fg[4:12, 4:12] = True
        out = np.asarray(morph_open(jnp.array(fg)))
        # Interior preserved; plus-kernel opening keeps the solid square
        # except possibly the 4 corners.
        assert out[5:11, 5:11].all()


class TestMaskToBoxes:
    def test_axis_aligned_rect(self):
        fg = np.zeros((32, 32), bool)
        fg[4:10, 6:18] = True  # h=6 rows, w=12 cols
        boxes, valid, counts, centroids = mask_to_rotated_boxes(jnp.array(fg))
        assert int(valid.sum()) == 1
        b = np.asarray(boxes[0])
        assert abs(b[0] - 12.0) < 0.6 and abs(b[1] - 7.0) < 0.6  # center (col,row)
        dims = sorted([b[2], b[3]])
        assert abs(dims[0] - 6.0) < 0.8 and abs(dims[1] - 12.0) < 0.8
        assert int(counts[0]) == 72

    def test_rotated_rect_angle(self):
        # Rasterize a 45°-rotated rectangle and recover its angle.
        h = w = 48
        rr, cc = np.mgrid[0:h, 0:w]
        u = (cc - 24) + (rr - 24)
        v = (cc - 24) - (rr - 24)
        fg = (np.abs(u) <= 16) & (np.abs(v) <= 6)
        boxes, valid, _, _ = mask_to_rotated_boxes(jnp.array(fg), max_pixels=2048)
        b = np.asarray(boxes[0])
        assert valid[0]
        ang = float(b[4]) % (np.pi / 2)
        assert abs(ang - np.pi / 4) < np.radians(3)
        dims = sorted([b[2], b[3]])
        np.testing.assert_allclose(dims, [6 * np.sqrt(2), 16 * np.sqrt(2)], rtol=0.15)

    def test_multiple_components_capacity(self):
        fg = np.zeros((64, 64), bool)
        for i in range(5):
            r, c = 3 + 12 * i, 5 + 11 * i
            fg[r : r + 4, c : c + 6] = True
        boxes, valid, counts, _ = mask_to_rotated_boxes(jnp.array(fg), max_components=8)
        assert int(valid.sum()) == 5
        assert np.all(np.asarray(counts)[np.asarray(valid)] == 24)

    def test_min_pixels_filter(self):
        fg = np.zeros((16, 16), bool)
        fg[3, 3] = True
        _, valid, _, _ = mask_to_rotated_boxes(jnp.array(fg), min_pixels=2)
        assert int(valid.sum()) == 0


class TestExtractDetections:
    def test_end_to_end_probs(self):
        h = w = 32
        c = 4  # bg + 3 classes
        probs = np.zeros((h, w, c), np.float32)
        probs[..., 0] = 1.0
        # One blob of class 2.
        probs[8:14, 8:20, 0] = 0.05
        probs[8:14, 8:20, 2] = 0.9
        probs[8:14, 8:20, 1] = 0.05
        out = extract_detections(jnp.array(probs), max_components=8)
        valid = np.asarray(out["box_valid"])
        assert valid.sum() == 1
        det = np.asarray(out["detect"])[0]
        scores = np.asarray(out["scores"])[0]
        assert det[1]  # class 2 (index 1 among non-bg)
        assert scores[1] > 0.8
        assert not det[2]
        # Class 1 at 0.05 ≥ 0.01 threshold also fires (reference behavior).
        assert det[0]

    def test_no_foreground(self):
        probs = np.zeros((16, 16, 3), np.float32)
        probs[..., 0] = 1.0
        out = extract_detections(jnp.array(probs), max_components=4)
        assert int(np.asarray(out["box_valid"]).sum()) == 0


class TestLogitsPathEquivalence:
    def test_logits_path_matches_probs_path(self):
        """extract_detections_from_logits (no full-grid softmax) must agree
        with the probs path on boxes, validity, scores and detect flags."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.mask_to_boxes import (
            extract_detections,
            extract_detections_from_logits,
        )

        rng = np.random.RandomState(5)
        logits = rng.randn(48, 48, 5).astype(np.float32)
        # plant two confident blobs of different classes
        logits[8:14, 8:16, :] = -3.0
        logits[8:14, 8:16, 1] = 4.0
        logits[30:36, 20:24, :] = -3.0
        logits[30:36, 20:24, 3] = 4.0
        lj = jnp.asarray(logits)
        probs = jax.nn.softmax(lj, axis=-1)
        a = jax.device_get(extract_detections(probs, max_components=8))
        b = jax.device_get(extract_detections_from_logits(lj, max_components=8))
        np.testing.assert_array_equal(a["box_valid"], b["box_valid"])
        np.testing.assert_array_equal(a["detect"], b["detect"])
        np.testing.assert_allclose(a["boxes_px"], b["boxes_px"], atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
