"""Data-layer tests: config round-trip, AOJ extraction, preprocessing codec,
databatch construction (reference test style: tests/test_data/test_jets.py)."""

import os

import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
    MultimodalDatabatch,
)
from multimodal_particles_tpu.data.particle_clouds.utils import (
    extract_aoj_features,
    physics_to_onehot,
    tokens_to_physics,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _small_config():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    return cfg


def test_config_roundtrip(tmp_path):
    cfg = _small_config()
    out = tmp_path / "roundtrip.yaml"
    cfg.to_yaml(str(out))
    cfg2 = MultimodalBridgeMatchingConfig.from_yaml(str(out))
    assert cfg2.data.max_num_particles == cfg.data.max_num_particles
    assert cfg2.bridge.gamma == cfg.bridge.gamma
    assert cfg2.encoder.dim_hidden_local == cfg.encoder.dim_hidden_local


def test_extract_aoj_features_shapes():
    path = os.path.join(test_resources_dir, "data", "2016H_job0_mini.h5")
    cont, disc, mask = extract_aoj_features([path], max_num_particles=128, num_jets=100)
    assert cont.shape == (100, 128, 3)
    assert disc.shape == (100, 128, 6)
    assert mask.shape == (100, 128, 1)
    # pT-descending among valid particles
    pt = cont[..., 0]
    valid = mask[..., 0] > 0
    for b in range(5):
        pts = pt[b][valid[b]]
        assert (np.diff(pts) <= 1e-6).all()
    # flavor one-hot well-formed on valid particles
    assert (disc[..., :5].sum(-1)[valid] == 1).all()
    # masked rows are zero
    assert (cont[~valid] == 0).all()


def test_token_codec_roundtrip():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 8, size=(4, 32, 1))
    flavor, charge = tokens_to_physics(tokens)
    one_hot = physics_to_onehot(flavor, charge[..., 0])
    back = np.argmax(one_hot, axis=-1)[..., None]
    assert (back == tokens).all()


def test_jet_dataclass_and_preprocessing():
    cfg = _small_config()
    jets = JetDataclass(cfg)
    assert jets.target.continuous.shape[1] == cfg.data.max_num_particles
    raw_continuous = jets.target.continuous.copy()
    raw_mask = jets.target.mask.copy()
    jets.preprocess()
    # tokens in vocab
    assert jets.target.discrete.shape[-1] == 1
    assert (jets.target.discrete >= 0).all()
    assert (jets.target.discrete < cfg.data.vocab_size_features).all()
    # standardized stats recorded into config
    assert cfg.data.target_preprocess_stats is not None
    # postprocess inverts the continuous standardization
    jets.postprocess()
    valid = raw_mask[..., 0] > 0
    np.testing.assert_allclose(
        jets.target.continuous[valid], raw_continuous[valid], atol=1e-4
    )


def test_dataloader_module_and_random_databatch():
    cfg = _small_config()
    jets = JetDataclass(cfg)
    jets.preprocess()
    dm = JetsDataloaderModule(cfg, jets)
    batch = next(iter(dm.train))
    rand_batch = JetsDataloaderModule.random_databatch(cfg)

    # shape parity between real and synthetic batches (reference:
    # tests/test_generative/test_multimodal.py:16-36)
    assert batch.source_continuous.shape[1:] == rand_batch.source_continuous.shape[1:]
    assert batch.target_discrete.shape[1:] == rand_batch.target_discrete.shape[1:]
    assert batch.target_mask.shape[1:] == rand_batch.target_mask.shape[1:]

    # histograms recorded
    cfg2 = dm.update_config(cfg)
    assert cfg2.data.target_info["hist_num_particles"] is not None


def test_onehot_dequantize_roundtrip():
    """The 'onehot_dequantize' discrete mode folds the 8-token one-hot into
    the continuous block and back (reference: particles.py:106-149)."""
    from multimodal_particles_tpu.data.particle_clouds.particles import ParticleClouds

    cfg = _small_config()
    pc = ParticleClouds(
        "AspenOpenJets", max_num_particles=32, num_jets=50, seed=0
    )
    raw_cont = pc.continuous.copy()
    raw_disc = pc.discrete.copy()
    pc.preprocess(output_continuous="standardize", output_discrete="onehot_dequantize")
    assert not hasattr(pc, "discrete")
    assert pc.continuous.shape[-1] == 3 + 8  # kinematics + token one-hot

    # the generation flow rebuilds a cloud from the combined tensor (the
    # tensor ctor splits it back into continuous[:3] / one-hot channels),
    # then postprocess inverts — same as the reference inference notebook
    full = np.concatenate([pc.continuous, pc.mask.astype(np.float32)], axis=-1)
    pc2 = ParticleClouds(full)
    pc2.stats = pc.stats
    pc2.postprocess(input_continuous="standardize", input_discrete="onehot_dequantize")
    assert pc2.continuous.shape[-1] == 3
    valid = pc2.mask[..., 0] > 0
    np.testing.assert_allclose(pc2.continuous[valid], raw_cont[valid], atol=1e-3)
    # discrete content restored (flavor one-hot + charge)
    assert pc2.discrete.shape[-1] == 6
    np.testing.assert_array_equal(pc2.discrete[valid], raw_disc[valid])


def test_three_way_split_and_test_loader():
    cfg = _small_config()
    cfg.data.data_split_frac = [0.6, 0.2, 0.2]
    jets = JetDataclass(cfg)
    jets.preprocess()
    dm = JetsDataloaderModule(cfg, jets)
    assert dm.test is not None
    n = sum(b.target_continuous.shape[0] for b in dm.test)
    assert n == 20  # 0.2 × 100 jets
