"""CLI smoke tests driving the full user surface on synthetic data."""


import json
import sys

import numpy as np
import pytest

from lyft3d_tpu.cli import main


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli") / "lyft"
    main(["synth-data", "--out", str(out), "--scenes", "1", "--samples", "2"])
    return out


class TestCLI:
    def test_generate_bev(self, data_root, tmp_path):
        out = tmp_path / "bev"
        main(["generate-bev", "--data-root", str(data_root), "--out", str(out)])
        assert len(list(out.glob("*_input.png"))) == 2

    def test_create_infos_and_gtdb(self, data_root, tmp_path):
        infos = tmp_path / "infos.pkl"
        main(["create-infos", "--data-root", str(data_root), "--out", str(infos),
              "--sweeps", "2"])
        assert infos.exists()
        gtdb = tmp_path / "gtdb"
        main(["create-gtdb", "--data-root", str(data_root), "--infos", str(infos),
              "--out", str(gtdb), "--classes", "car,truck,bus,pedestrian"])
        assert (gtdb / "dbinfos.pkl").exists()

    def test_export_kitti(self, data_root, tmp_path):
        out = tmp_path / "kitti"
        main(["export-kitti", "--data-root", str(data_root), "--out", str(out)])
        assert (out / "velodyne" / "000000.bin").exists()

    def test_infer_and_eval_map(self, data_root, tmp_path, capsys):
        sub = tmp_path / "submission.csv"
        main([
            "infer-bev", "--data-root", str(data_root),
            "--model", "unet_reference", "--out", str(sub),
        ])
        assert sub.exists()
        main(["eval-map", "--data-root", str(data_root), "--submission", str(sub)])
        out = capsys.readouterr().out
        assert '"mAP"' in out


class TestRunExperiments:
    """Batch experiment queue (script_server.py capability)."""

    def test_queue_survives_failures(self, data_root, tmp_path, capsys):
        import yaml

        bev = tmp_path / "bev"
        main(["generate-bev", "--data-root", str(data_root), "--out", str(bev)])

        good = tmp_path / "good.yaml"
        good.write_text(yaml.safe_dump({
            "model": "unet_reference",
            "batch_size": 1,
            "model_dir": str(tmp_path / "run_good"),
            "optimizer": {"total_steps": 2},
        }))
        bad = tmp_path / "bad.yaml"
        bad.write_text(yaml.safe_dump({
            "model": "no_such_model",
            "model_dir": str(tmp_path / "run_bad"),
        }))
        summary = tmp_path / "summary.json"
        main(["run-experiments", "--bev-dir", str(bev),
              "--configs", str(bad), str(good), "--summary", str(summary)])
        recs = json.loads(summary.read_text())
        assert [r["status"] for r in recs] == ["failed", "ok"]
        assert recs[1]["steps"] == 2
        assert (tmp_path / "run_good" / "checkpoints.json").exists()

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
