"""Typed config tree for AbsorbingFlow.

Schema-compatible with the reference absorbing config
(reference: config_classes/absorbing_flows_config.py:97-141,
tests/resources/configs_files/config-absorbing-test.yaml).
"""

from dataclasses import dataclass, field, asdict
from typing import Dict, List, Optional, Union

import yaml

from multimodal_particles_tpu.config_classes.multimodal_bridge_matching_config import (
    EncoderConfig,
    ParallelConfig,
    TrainingConfig,
    _build,
)


@dataclass
class JetsDataConfig:
    target_name: str = "AspenOpenJets"
    target_path: Optional[List[str]] = None
    target_preprocess_continuous: str = "standardize"
    target_preprocess_discrete: str = "tokens"
    target_info: Dict[str, Union[list, dict, None]] = field(
        default_factory=lambda: {"stats": None, "hist_num_particles": None}
    )
    source_name: str = "GaussNoise"
    source_path: Optional[List[str]] = None
    source_preprocess_continuous: Optional[str] = None
    source_preprocess_discrete: str = "tokens"
    source_info: Dict[str, Union[list, dict, None]] = field(
        default_factory=lambda: {"stats": None, "hist_num_particles": None}
    )
    source_masks_from_target_masks: bool = True
    fill_target_with_noise: bool = True

    min_num_particles: int = 0
    max_num_particles: int = 109
    num_jets: int = 1000
    dim_features_continuous: int = 3
    dim_features_discrete: int = 1
    dim_context_continuous: int = 0
    dim_context_discrete: int = 0
    vocab_size_features: int = 8
    vocab_size_context: int = 0
    return_type: str = "namedtuple"

    batch_size: int = 28
    data_split_frac: List[float] = field(default_factory=lambda: [0.8, 0.2, 0.0])

    source_preprocess_stats: Optional[dict] = None
    target_preprocess_stats: Optional[dict] = None


@dataclass
class BridgeConfig:
    continuous: str = "LinearUniformBridge"
    discrete: str = "TelegraphBridge"
    absorbing: str = "AbsorbingBridge"

    sigma: float = 0.0001
    gamma: float = 0.125
    gamma_absorb: float = 0.125

    num_timesteps: int = 1000
    time_eps: float = 0.0001
    # Source-consistent mask-bridge augmentation (0.0 = exact reference
    # semantics). The reference's training masks ALWAYS contain the target
    # (absorbing bridge = target ∪ extras), so the survival head never sees
    # a dead slot whose BCE label is alive — and since the mask solver is
    # birth-only, the trained dynamics cannot correct an under-multiplicity
    # generation init (measured: wrong-histogram stress KL barely moves).
    # With target_dropout = d > 0, training drops each TARGET slot from
    # mask_t with probability d·SP(t) (alive w.p. 1 at t=1, 1-d at t=0,
    # mirroring the extras' death schedule), teaching the head to revive
    # slots the jet still needs.
    # 3-seed evidence (benchmarks/quality_absorbing_source_consistent.json,
    # top level): at d=0.1 the under-multiplicity stress corrects in 3/3
    # seeds, the over-multiplicity stress in 2/3 (birth-only solver), at a
    # ~3% nominal multiplicity cost (W1_mult median 2.02 vs 0.46-0.84 at
    # d=0). Recommended: keep 0.0 (exact reference semantics) for
    # data-derived source masks; use 0.1 when generating from a possibly
    # wrong multiplicity law.
    target_dropout: float = 0.0
    # Opt-in DEATH channel for the mask solver (beyond the reference, whose
    # solver is birth-only — reference: models/generative/bridges.py:233-249).
    # Sampling-time only (no retraining): an alive slot is a target slot
    # with posterior p = sigmoid(head logit) — the head's BCE label is the
    # target mask — and a non-target slot's bridge-conditional death hazard
    # is h(t) = -d/dt log SP(t); the solver kills alive slots at
    # scale·(1-p)·h(t) (bridges.absorbing_death_hazard). At 0.0 (default)
    # the solver is exactly the reference's birth-only step. Use with
    # target_dropout-trained heads to correct over-multiplicity generation
    # inits the birth-only solver cannot
    # (quality_absorbing_source_consistent.json uniform stress).
    death_rate_scale: float = 0.0


@dataclass
class GeneratorsHeadConfig:
    """Heads for survival-rate prediction and particle creation."""

    rate_use_x0_pred: bool = True
    transformer_dim: int = 128
    temb_dim: int = 128
    n_heads: int = 2
    n_attn_blocks: int = 2
    detach_last_layer: bool = True
    augment_dim: int = 9
    discrete_head_hidden_dim: int = 56


@dataclass
class AbsorbingConfig:
    name_str: str = "ExampleModel"
    experiment_name: str = "absorbing_flows"
    experiment_indentifier: Optional[str] = None
    experiment_dir: Optional[str] = None

    bridge: BridgeConfig = field(default_factory=BridgeConfig)
    data: JetsDataConfig = field(default_factory=JetsDataConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    generator: GeneratorsHeadConfig = field(default_factory=GeneratorsHeadConfig)
    train: TrainingConfig = field(default_factory=TrainingConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    @staticmethod
    def from_yaml(file_path: str) -> "AbsorbingConfig":
        with open(file_path, "r") as f:
            config_dict = yaml.safe_load(f)
        return AbsorbingConfig.from_dict(config_dict)

    @staticmethod
    def from_dict(config_dict: dict) -> "AbsorbingConfig":
        return AbsorbingConfig(
            name_str=config_dict.get("name_str", "ExampleModel"),
            experiment_name=config_dict.get("experiment_name", "absorbing_flows"),
            experiment_indentifier=config_dict.get("experiment_indentifier"),
            experiment_dir=config_dict.get("experiment_dir"),
            bridge=_build(BridgeConfig, config_dict.get("bridge", {})),
            data=_build(JetsDataConfig, config_dict.get("data", {})),
            encoder=_build(EncoderConfig, config_dict.get("encoder", {})),
            generator=_build(GeneratorsHeadConfig, config_dict.get("generator", {})),
            train=_build(TrainingConfig, config_dict.get("train", {})),
            parallel=_build(ParallelConfig, config_dict.get("parallel", {})),
        )

    def to_yaml(self, file_path: str):
        with open(file_path, "w") as f:
            yaml.dump(asdict(self), f, default_flow_style=False)

    def to_dict(self) -> dict:
        return asdict(self)
