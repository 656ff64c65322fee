"""Typed config tree for MultiModalBridgeMatching.

YAML schema is kept field-compatible with the reference so its config files
keep working (reference: config_classes/multimodal_bridge_matching_config.py:6-117,
configs_files/config-berlin.yaml). TPU-specific knobs live in `ParallelConfig`
with safe defaults so reference YAMLs (which lack a `parallel:` section) load
unchanged.
"""

from dataclasses import dataclass, field, asdict
from typing import Dict, List, Optional, Union

import yaml


@dataclass
class TrainingConfig:
    epochs: int = 200
    gradient_clip_val: float = 1.0
    optimizer_name: str = "AdamW"
    lr: float = 0.001
    weight_decay: float = 5.0e-5
    betas: List[float] = field(default_factory=lambda: [0.9, 0.999])
    eps: float = 1.0e-8
    amsgrad: bool = False
    scheduler_name: str = "CosineAnnealingLR"
    scheduler_params: Dict[str, Union[float, int]] = field(
        default_factory=lambda: {"T_max": 1000, "eta_min": 5.0e-5, "last_epoch": -1}
    )


@dataclass
class JetsDataConfig:
    # target
    target_name: str = "AspenOpenJets"
    target_path: Optional[List[str]] = None
    target_preprocess_continuous: str = "standardize"
    target_preprocess_discrete: str = "tokens"
    target_info: Dict[str, Union[list, dict, None]] = field(
        default_factory=lambda: {"stats": None, "hist_num_particles": None}
    )
    # source
    source_name: str = "GaussNoise"
    source_path: Optional[List[str]] = None
    source_preprocess_continuous: Optional[str] = None
    source_preprocess_discrete: str = "tokens"
    source_info: Dict[str, Union[list, dict, None]] = field(
        default_factory=lambda: {"stats": None, "hist_num_particles": None}
    )
    # if True, source mask multiplicities are sampled from the target's
    # empirical multiplicity histogram
    source_masks_from_target_masks: bool = True
    fill_target_with_noise: bool = True

    # dimensions
    min_num_particles: int = 0
    max_num_particles: int = 128
    num_jets: int = 1000
    dim_features_continuous: int = 3
    dim_features_discrete: int = 1
    dim_context_continuous: int = 0
    dim_context_discrete: int = 0
    vocab_size_features: int = 8
    vocab_size_context: int = 0
    # 'namedtuple' for MBM/absorbing, 'list' for transdimensional batches
    return_type: str = "namedtuple"

    batch_size: int = 1024
    data_split_frac: List[float] = field(default_factory=lambda: [0.8, 0.2, 0.0])

    # populated at runtime by preprocessing (standardization stats)
    source_preprocess_stats: Optional[dict] = None
    target_preprocess_stats: Optional[dict] = None


@dataclass
class BridgeConfig:
    continuous: str = "LinearUniformBridge"
    discrete: str = "TelegraphBridge"
    sigma: float = 0.0001
    gamma: float = 0.125
    num_timesteps: int = 1000
    time_eps: float = 0.0001


@dataclass
class EncoderConfig:
    name: str = "MultiModalEPiC"
    num_blocks: int = 2
    embedding_time: str = "SinusoidalPositionalEncoding"
    embedding_features_continuous: str = "Linear"
    embedding_features_discrete: str = "Embedding"
    embedding_context_continuous: Optional[str] = None
    embedding_context_discrete: Optional[str] = None
    dim_hidden_local: int = 16
    dim_hidden_glob: int = 16
    dim_emb_time: int = 16
    dim_emb_features_continuous: int = 16
    dim_emb_features_discrete: int = 16
    dim_emb_context_continuous: int = 0
    dim_emb_context_discrete: int = 0
    skip_connection: bool = True
    dropout: float = 0.1
    activation: str = "SELU"
    add_discrete_head: bool = True


@dataclass
class ParallelConfig:
    """TPU execution knobs (new in the rebuild; absent from reference YAMLs)."""

    # mesh axis sizes; -1 on `data` means "all visible devices"
    data_axis: int = -1
    model_axis: int = 1
    # compute dtype for network activations ('float32' or 'bfloat16')
    compute_dtype: str = "float32"
    # donate state buffers in the jitted train/sample steps
    donate_buffers: bool = True
    # fused Pallas EPiC forward on the sampling path:
    # True / False / 'auto' (on for TPU backends when the encoder config
    # matches the supported pattern)
    use_pallas: object = "auto"
    # 'jit' (XLA derives collectives from shardings) or 'shard_map'
    # (explicit psum/pmean formulation, parallel/collectives.py)
    spmd_mode: str = "jit"
    # skip optimizer updates whose gradients contain NaN/inf
    skip_nonfinite_updates: bool = False


@dataclass
class MultimodalBridgeMatchingConfig:
    name_str: str = "ExampleModel"
    bridge: BridgeConfig = field(default_factory=BridgeConfig)
    data: JetsDataConfig = field(default_factory=JetsDataConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    train: TrainingConfig = field(default_factory=TrainingConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    @staticmethod
    def from_yaml(file_path: str) -> "MultimodalBridgeMatchingConfig":
        with open(file_path, "r") as f:
            config_dict = yaml.safe_load(f)
        return MultimodalBridgeMatchingConfig.from_dict(config_dict)

    @staticmethod
    def from_dict(config_dict: dict) -> "MultimodalBridgeMatchingConfig":
        return MultimodalBridgeMatchingConfig(
            name_str=config_dict.get("name_str", "ExampleModel"),
            bridge=_build(BridgeConfig, config_dict.get("bridge", {})),
            data=_build(JetsDataConfig, config_dict.get("data", {})),
            encoder=_build(EncoderConfig, config_dict.get("encoder", {})),
            train=_build(TrainingConfig, config_dict.get("train", {})),
            parallel=_build(ParallelConfig, config_dict.get("parallel", {})),
        )

    def to_yaml(self, file_path: str):
        with open(file_path, "w") as f:
            yaml.dump(asdict(self), f, default_flow_style=False)

    def to_dict(self) -> dict:
        return asdict(self)


def _build(cls, d: dict):
    """Construct a config dataclass ignoring unknown keys (forward compat)."""
    known = {f for f in cls.__dataclass_fields__}
    return cls(**{k: v for k, v in d.items() if k in known})
