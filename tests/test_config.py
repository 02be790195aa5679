"""Config system tests: YAML round-trip, overrides, snapshot, typo guard."""

import pytest

from lyft3d_tpu.config import (
    AnchorConfig,
    BEVExperiment,
    OptimizerConfig,
    SecondExperiment,
    apply_overrides,
    from_dict,
    load_yaml,
    save_yaml,
    snapshot_config,
    to_dict,
)


class TestRoundTrip:
    def test_yaml_roundtrip_bev(self, tmp_path):
        cfg = BEVExperiment(model="unet_dpn68", batch_size=16)
        cfg.optimizer.lr = 5e-4
        path = save_yaml(cfg, tmp_path / "exp.yaml")
        back = load_yaml(BEVExperiment, path)
        assert back == cfg
        assert isinstance(back.optimizer, OptimizerConfig)
        assert back.bev_shape == (336, 336, 3)  # tuple reconstructed

    def test_yaml_roundtrip_second_nested_anchors(self, tmp_path):
        cfg = SecondExperiment(
            anchors=(
                AnchorConfig(class_name="car"),
                AnchorConfig(class_name="bus", size=(2.96, 12.34, 3.44), z_center=-0.5),
            ),
            db_sampler_quota={"car": 10, "bus": 4},
        )
        back = load_yaml(SecondExperiment, save_yaml(cfg, tmp_path / "s.yaml"))
        assert back == cfg
        assert back.anchors[1].class_name == "bus"
        assert back.db_sampler_quota["bus"] == 4

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError, match="unknown config key"):
            from_dict(OptimizerConfig, {"lr": 1.0, "typo_field": 2})


class TestOverrides:
    def test_dotted_override(self):
        cfg = BEVExperiment()
        out = apply_overrides(cfg, ["optimizer.lr=0.01", "batch_size=8",
                                    "model=unet_resnet34"])
        assert out.optimizer.lr == 0.01
        assert out.batch_size == 8
        assert out.model == "unet_resnet34"
        assert cfg.optimizer.lr != 0.01  # original untouched

    def test_override_list_value(self):
        out = apply_overrides(BEVExperiment(), ["bev_shape=[128, 128, 3]"])
        assert out.bev_shape == (128, 128, 3)

    def test_unknown_override_rejected(self):
        with pytest.raises(KeyError):
            apply_overrides(BEVExperiment(), ["optimizer.nope=1"])


class TestSnapshot:
    def test_snapshot_writes_yaml(self, tmp_path):
        path = snapshot_config(BEVExperiment(), tmp_path / "run1")
        assert path.exists()
        assert load_yaml(BEVExperiment, path) == BEVExperiment()


class TestConfigTools:
    def test_change_detection_range(self):
        from lyft3d_tpu.config import SecondExperiment, change_detection_range

        exp = SecondExperiment()
        out = change_detection_range(exp, (-20, -20, -3, 20, 20, 3))
        assert out.point_cloud_range == (-20, -20, -3, 20, 20, 3)
        assert exp.point_cloud_range != out.point_cloud_range  # original intact
        assert out.anchors == exp.anchors


def test_override_type_mismatch_raises():
    """Non-JSON text for a typed field fails at the CLI boundary, not in jit."""
    import pytest

    from lyft3d_tpu.config import BEVExperiment, apply_overrides

    with pytest.raises(ValueError, match="JSON syntax"):
        apply_overrides(BEVExperiment(), ["voxel_size=(0.4,0.4,1.5)"])
    # JSON list is fine, and strings stay strings.
    cfg = apply_overrides(BEVExperiment(), ["voxel_size=[0.4,0.4,1.5]", "model=unet_reference"])
    assert tuple(cfg.voxel_size) == (0.4, 0.4, 1.5)
    assert cfg.model == "unet_reference"
