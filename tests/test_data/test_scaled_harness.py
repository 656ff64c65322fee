"""Family dispatch + config plumbing of the scaled-data quality harness
(scripts/quality_scaled_data.py). The training/generation paths are
exercised by the artifact runs (benchmarks/quality_*_scaled_data.json);
these tests pin the cheap invariants: all three families are dispatchable
and the shard/encoder overrides land on every family's config tree."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import quality_scaled_data as qsd  # noqa: E402


class _Args:
    n_data = 1234
    max_particles = 48
    batch_size = 256
    seed = 11


def test_all_three_families_dispatchable():
    assert sorted(qsd.RUNNERS) == ["absorbing", "mbm", "transdim"]


def test_shard_overrides_land_on_every_family_config():
    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import (
        AbsorbingConfig,
        MultimodalBridgeMatchingConfig,
    )
    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )

    yaml_dir = os.path.join(test_resources_dir, "configs_files")
    configs = [
        MultimodalBridgeMatchingConfig.from_yaml(
            os.path.join(yaml_dir, "config-mbm-test.yaml")
        ),
        AbsorbingConfig.from_yaml(
            os.path.join(yaml_dir, "config-absorbing-test.yaml")
        ),
        TransdimensionalEpicConfig(),
    ]
    for config in configs:
        qsd._point_data_at_shard(config, _Args, "/tmp/shard.h5")
        assert config.data.target_name == "JetClass"
        assert config.data.target_path == ["/tmp/shard.h5"]
        assert config.data.num_jets == 1234
        assert config.data.max_num_particles == 48
        assert config.data.batch_size == 256


def test_widen_encoder_sets_every_width_field():
    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import (
        MultimodalBridgeMatchingConfig,
    )

    config = MultimodalBridgeMatchingConfig.from_yaml(
        os.path.join(
            test_resources_dir, "configs_files", "config-mbm-test.yaml"
        )
    )
    qsd._widen_encoder(config.encoder, hidden=64, blocks=4)
    enc = config.encoder
    assert enc.num_blocks == 4
    assert enc.dim_hidden_local == enc.dim_hidden_glob == 64
    assert enc.dim_emb_time == 64
    assert enc.dim_emb_features_continuous == 64
    assert enc.dim_emb_features_discrete == 64


def test_epochs_for_rounds_up():
    class A:
        train_steps = 100

    assert qsd._epochs_for(A, 16) == 7
    assert qsd._epochs_for(A, 0) == 100
