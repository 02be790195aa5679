"""End-to-end BEV slice tests on the synthetic dataset.

The oracle round-trip is the key parity check: render GT boxes to a class
map, run the on-device extraction + world-frame boxing, and score with the
official mAP — recovering the GT from its own raster must give high AP at
IoU 0.5. This validates rasterization, component extraction, the inverse
pixel→car→world transform, and the metric in one loop.
"""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyft3d_tpu.data.bev_pipeline import BEVConfig, BEVSampleGenerator
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.eval.map_eval import evaluate_map, get_average_precisions
from lyft3d_tpu.eval.submission import (
    read_submission,
    records_from_detections,
    write_submission,
)
from lyft3d_tpu.models import build_model
from lyft3d_tpu.ops.bev_raster import rasterize_boxes_bev
from lyft3d_tpu.ops.mask_to_boxes import extract_detections
from lyft3d_tpu.pipelines.bev import (
    BEVInferencePipeline,
    detections_to_world,
    gt_records,
)

BIG_CLASSES = ["car", "bus", "truck"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("lyft_e2e"),
        num_scenes=2,
        samples_per_scene=2,
        boxes_per_sample=5,
        classes=BIG_CLASSES,
        seed=7,
    )
    db = LyftDB(root, root / "data")
    cfg = BEVConfig(num_sweeps=1, max_points=16384)
    gen = BEVSampleGenerator(db, cfg)
    tokens = [s["token"] for s in db.sample]
    return db, cfg, gen, tokens


class TestOracleRoundTrip:
    def test_gt_raster_recovers_gt_boxes(self, setup):
        db, cfg, gen, tokens = setup
        n_cls = len(cfg.classes)
        dets_by_sample = {}
        for tok in tokens:
            corners, classes, valid = gen.box_corners_px(tok)
            target = rasterize_boxes_bev(
                jnp.asarray(corners),
                jnp.asarray(classes),
                jnp.asarray(valid),
                cfg.shape[:2],
            )
            # one-hot probabilities from the GT class map
            probs = jax.nn.one_hot(target, n_cls + 1, dtype=jnp.float32)
            det = jax.device_get(
                extract_detections(probs, class_score_threshold=0.5, max_components=16)
            )
            dets_by_sample[tok] = detections_to_world(gen, tok, det)

        gt = gt_records(db, tokens)
        preds = records_from_detections(dets_by_sample)
        assert len(preds) > 0
        ap50 = get_average_precisions(gt, preds, sorted({g["name"] for g in gt}), 0.5)
        # Every GT box rendered and recovered: AP@0.5 should be high (raster
        # quantization at 0.4 m/px costs some corner precision).
        assert float(np.mean(ap50)) > 0.75, ap50
        overall, _ = evaluate_map(gt, preds)
        assert overall > 0.35

    def test_submission_csv_roundtrip(self, setup, tmp_path):
        db, cfg, gen, tokens = setup
        dets = {
            tokens[0]: [
                {
                    "sample_token": tokens[0],
                    "translation": [10.0, 20.0, 1.0],
                    "size": [2.0, 4.0, 1.5],
                    "yaw": 0.7,
                    "name": "car",
                    "score": 0.9,
                }
            ],
            tokens[1]: [],
        }
        path = write_submission(tmp_path / "sub.csv", dets, tokens[:2])
        back = read_submission(path)
        assert set(back) == set(tokens[:2])
        d = back[tokens[0]][0]
        np.testing.assert_allclose(d["translation"], [10.0, 20.0, 1.0])
        np.testing.assert_allclose(d["size"], [2.0, 4.0, 1.5])
        assert d["name"] == "car" and abs(d["yaw"] - 0.7) < 1e-6
        assert back[tokens[1]] == []


class TestModelInLoop:
    def test_untrained_model_pipeline_runs(self, setup):
        db, _, _, tokens = setup
        cfg = BEVConfig(
            shape=(64, 64, 3),
            voxel_size=(0.8, 0.8, 1.5),
            max_points=16384,
            num_sweeps=1,
        )
        model = build_model("unet_reference", n_classes=10, wf=3, depth=2, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 6), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        pipe = BEVInferencePipeline(db, [(model, params)], cfg, max_components=16)
        dets = pipe.detect_sample(tokens[0])
        assert isinstance(dets, list)  # untrained → any (or zero) detections
        for d in dets:
            assert set(d) >= {"translation", "size", "rotation", "name", "score"}

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
