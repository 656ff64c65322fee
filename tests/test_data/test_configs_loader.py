"""Free-form nested config loader tests (reference schema:
configs_files/config-berlin.yaml)."""

import os

from multimodal_particles_tpu.utils.experiment_configs import (
    Configs,
    load_config,
    yaml_to_namespace,
)

BERLIN = "/root/reference/configs_files/config-berlin.yaml"


def test_load_reference_berlin_yaml():
    cfg = load_config(BERLIN)
    assert cfg.data.target.name == "AspenOpenJets"
    assert cfg.model.encoder.num_blocks == 2
    assert cfg.model.bridge_params.gamma == 0.125
    # auto experiment naming fills identifier
    assert cfg.experiment.experiment_indentifier is not None


def test_roundtrip_and_to_dict(tmp_path):
    cfg = load_config(BERLIN)
    path = str(tmp_path / "saved.yaml")
    cfg.save(path)
    cfg2 = load_config(path)
    assert cfg2.model.encoder.hidden_local == cfg.model.encoder.hidden_local
    d = cfg2.to_dict()
    assert isinstance(d["model"]["train"], dict)


def test_yaml_to_namespace_nested_lists():
    ns = yaml_to_namespace({"a": [{"b": 1}, {"b": 2}], "c": 3})
    assert ns.a[0].b == 1 and ns.c == 3
