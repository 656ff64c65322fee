"""Typed config tree for the transdimensional jump-diffusion model.

Schema-compatible with the reference (reference:
config_classes/transdimensional_unconditional_config.py:5-268,
configs_files/config-transepic-berlin.yaml).
"""

from dataclasses import dataclass, field, asdict
from typing import Dict, List, Optional, Union

import yaml

from multimodal_particles_tpu.config_classes.multimodal_bridge_matching_config import (
    ParallelConfig,
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
    # the reference transdimensional config has no fill flag → False behavior
    fill_target_with_noise: bool = False

    min_num_particles: int = 0
    max_num_particles: int = 128
    num_jets: int = 100
    dim_features_continuous: int = 3
    dim_features_discrete: int = 1
    dim_context_continuous: int = 0
    dim_context_discrete: int = 0
    vocab_size_features: int = 8
    vocab_size_context: int = 0

    return_type: str = "namedtuple"

    # transdimensional arguments
    graphical_structure: str = ""
    exist: Optional[List[int]] = None
    observed: Optional[List[int]] = None

    batch_size: int = 28
    data_split_frac: List[float] = field(default_factory=lambda: [0.8, 0.2, 0.0])

    source_preprocess_stats: Optional[dict] = None
    target_preprocess_stats: Optional[dict] = None


@dataclass
class LossKwargs:
    class_name: str = "training.loss.JumpLossFinalDim"
    score_loss_weight: float = 1.0
    rate_loss_weight: float = 1.0
    min_t: float = 0.001
    mean_or_sum_over_dim: str = "mean"
    nearest_atom_pred: bool = True
    rate_function_name: str = "step"
    noise_schedule_name: str = "vp_sde"
    auto_loss_weight: float = 1.0
    vp_sde_beta_max: float = 20.0
    nearest_atom_loss_weight: float = 1.0
    x0_logit_ce_loss_weight: float = 1.0
    vp_sde_beta_min: float = 0.1
    loss_type: str = "eps"
    rate_cut_t: float = 0.1
    # "live" divides each sample's score-matching error by its number of
    # LIVE flat entries instead of the full flat dimension ("dims", the
    # reference behavior). Under the reference's /D normalization a
    # dims=1 sample contributes ~1/(N·(Dc+V)/(Dc+V)) = 1/N of the score
    # gradient of a full jet, so the eps head never learns the dims=1
    # states the reverse sampler STARTS in and trajectories diverge from
    # step one (the reference's own loss test is skipped with "PROBLEM
    # WITH INTERPOLATION TO ONE PARTICLE" — tests/test_generative/
    # test_transdimensional.py:112).
    score_loss_normalization: str = "live"


@dataclass
class OptimizerKwargs:
    class_name: str = "torch.optim.Adam"
    lr: float = 3e-5
    betas: List[float] = field(default_factory=lambda: [0.9, 0.999])
    eps: float = 1e-8


@dataclass
class StructureKwargs:
    exist: List[int] = field(default_factory=lambda: [1] * 9)
    observed: List[int] = field(default_factory=lambda: [0, 0, 0, 1, 1, 1, 1, 1, 1])


@dataclass
class SamplerKwargs:
    class_name: str = "training.sampler.JumpSampler"
    dt: float = 0.001
    do_jump_back: bool = False
    corrector_start_time: float = 0.1
    corrector_steps: int = 0
    corrector_finish_time: float = 0.003
    dt_schedule: str = "uniform"
    dt_schedule_h: float = 0.001
    condition_type: str = "sweep"
    do_jump_corrector: bool = False
    guidance_weight: float = 1.0
    dt_schedule_tc: float = 0.5
    condition_sweep_idx: int = 0
    sample_near_atom: bool = True
    do_conditioning: bool = False
    condition_sweep_path: Optional[str] = None
    dt_schedule_l: float = 0.001
    corrector_snr: float = 0.1
    jump_back_start_time: float = 0.5
    no_noise_final_step: bool = False
    # Production-robustness knob beyond the reference: clamp the live flat
    # latents to [-clip_lats, clip_lats] after every sampler step so one
    # diverging tail trajectory cannot poison its jet (data is
    # standardized, O(1); None = reference behavior, no clamping).
    clip_lats: Optional[float] = None
    # Max births per solver step. The reference's jump step births at most
    # ONE particle per step (sampler.py:237-255), so its step count must
    # scale with the target multiplicity (~1000 steps for ~46-particle
    # jets). >1 enables the tau-leaped multi-birth chain: with the step's
    # x0-dim logits frozen, the per-level birth rates r(dims..dims+K-1)
    # are computed up front and the pure-birth chain's exponential waiting
    # times are sampled exactly — at dt→0 (or multi_birth=1) this reduces
    # to the reference semantics.
    multi_birth: int = 16
    # Exact per-step time integral of the birth intensity (multi-birth path
    # only). The x0-pred reverse rate factorizes as f(t)/L(t) * G(d, x) with
    # L = the forward-rate integral, and since dL/dt = f its exact step
    # integral is ln L(t) - ln L(t-dt) — LOG-SINGULAR as L→0+ at the rate
    # cut. The left-endpoint product f(t)*dt/L(t) (reference semantics)
    # systematically undersamples that singular mass, which is the measured
    # root cause of the terminal-multiplicity undershoot (diagnosed with
    # scripts/diagnose_transdim.py: realized births 37.8 vs rate-integral
    # 41.1 vs needed 44.9 at 96 steps). False = left-endpoint product.
    exact_rate_integral: bool = True
    # Replace the x0-dim classifier's logits at dims==1 rows (multi-birth
    # x0-pred path only) by the ANALYTIC posterior
    #   log p(d0 | dims=1, t) = log p_prior(d0) + log P(Poisson(L(t)) >= d0-1)
    # where p_prior is the training multiplicity histogram
    # (DistributionNodes, kernel-smoothed). At dims=1 the state carries no
    # usable evidence about d0 (one noisy particle), yet the trained
    # classifier is measurably biased low there (mean d0 37 vs analytic 43
    # at t=0.5 on the quality run) — the onset lag behind the forward
    # marginal that scripts/diagnose_transdim.py localizes. Requires the
    # model to be built with a datamodule (for nodes_dist) or a config
    # carrying data.target_info['hist_num_particles'] (auto-wired); emits a
    # loud UserWarning and falls back to the classifier otherwise.
    analytic_dim1_posterior: bool = True
    # Extend the analytic posterior to EVERY state (multi-birth x0-pred
    # path, requires analytic_dim1_posterior + a prior source): replace the
    # classifier logits at all rows by the exact count-conditional posterior
    #   log p(d0 | dims, t) = log p_prior(d0) + log Poisson_pmf(d0-dims; L(t))
    # (dims>1; clamp survival at dims=1). The reverse birth rate then equals
    # f(t)·p_t(dims+1)/p_t(dims) — the exact time-reversal of the forward
    # death chain — so the terminal multiplicity distribution is the
    # training prior itself, up to tau-leap discretization. Fixes the
    # late-time classifier bias (r3's +4% terminal-mean overshoot, KL_mult
    # 0.503): the classifier keeps predicting d0 > dims at caught-up states
    # where the count evidence is already decisive. The classifier's x_t
    # evidence only informs the multiplicity-kinematics correlation, which
    # the x0 classifier is too biased to deliver at this data scale —
    # set False to restore the round-3 dims=1-only behavior.
    analytic_posterior_all_dims: bool = True
    # Gaussian smoothing (in particles) of the analytic posterior's
    # multiplicity prior. 0.0 (default) = the EXACT empirical histogram:
    # with analytic_posterior_all_dims the terminal multiplicity law IS
    # this prior, and the exact histogram is the reference's own target
    # (DistributionNodes) and the measured plug-in-KL floor. Set >0 (r3
    # used sigma=2) to spread mass beyond the observed multiplicities.
    analytic_prior_smoothing_sigma: float = 0.0


@dataclass
class GradConditionerKwargs:
    class_name: str = "training.grad_conditioning.MoleculeJump"
    grad_norm_clip: float = 1.0
    lr_rampup_kimg: int = 320


@dataclass
class EncoderConfig:
    # EPiC trunk
    name: str = "TransdimensionalEPiC"
    num_blocks: int = 2
    embedding_time: str = "SinusoidalPositionalEncoding"
    embedding_features_continuous: str = "Linear"
    # "Linear" feeds the trunk the noisy one-hot channel VALUES (a Dense
    # over them), which the D_xt head must denoise. The reference uses
    # "Embedding" of the argmax token (transdimensional_model.py:258-266),
    # an information bottleneck that makes the one-hot eps unlearnable
    # (MSE ~ 1 at every t) and the reverse jump sampler diverge from its
    # first steps; "Embedding" is still accepted for reference parity.
    embedding_features_discrete: str = "Linear"
    embedding_context_continuous: Optional[str] = None
    embedding_context_discrete: Optional[str] = None
    dim_hidden_local: int = 16
    dim_hidden_glob: int = 19
    dim_emb_time: int = 16
    dim_emb_features_continuous: int = 16
    dim_emb_features_discrete: int = 16
    dim_emb_context_continuous: int = 0
    dim_emb_context_discrete: int = 0
    skip_connection: bool = True
    dropout: float = 0.1
    activation: str = "SELU"
    add_discrete_head: bool = True

    # transdimensional heads (rate / nearest-atom / creation)
    rate_use_x0_pred: bool = True
    transformer_dim: int = 128
    n_heads: int = 2
    n_attn_blocks: int = 2
    detach_last_layer: bool = True
    augment_dim: int = 9


@dataclass
class AugmentKwargs:
    class_name: str = "training.augment.AugmentPipe"
    p: float = 0.12
    xflip: float = 1e8
    yflip: int = 1
    scale: int = 1
    rotate_frac: int = 1
    aniso: int = 1
    translate_frac: int = 1


@dataclass
class TransdimensionalEpicConfig:
    """Typed config tree for the transdimensional family.

    Reference YAMLs load unchanged, but two DEFAULTS deliberately diverge
    from reference semantics because the reference combination never
    produced a working generator (its loss test is skipped upstream):
    ``loss_kwargs.score_loss_normalization`` defaults to ``"live"`` (not
    the reference's ``"dims"``) and
    ``encoder.embedding_features_discrete`` defaults to ``"Linear"`` (not
    ``"Embedding"``). Set both to the reference values for exact reference
    semantics — the torch-golden parity tests pin that mode explicitly.
    """

    data: JetsDataConfig = field(default_factory=JetsDataConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)

    loss_kwargs: LossKwargs = field(default_factory=LossKwargs)
    optimizer_kwargs: OptimizerKwargs = field(default_factory=OptimizerKwargs)
    structure_kwargs: StructureKwargs = field(default_factory=StructureKwargs)
    sampler_kwargs: SamplerKwargs = field(default_factory=SamplerKwargs)
    grad_conditioner_kwargs: GradConditionerKwargs = field(
        default_factory=GradConditionerKwargs
    )
    augment_kwargs: AugmentKwargs = field(default_factory=AugmentKwargs)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    just_visualize: bool = False
    distributed: bool = False
    device: str = "tpu"

    total_kimg: int = 200000
    ema_halflife_kimg: int = 500
    batch_size: int = 64
    batch_gpu: Optional[int] = None
    loss_scaling: float = 1.0
    cudnn_benchmark: bool = True
    kimg_per_tick: int = 50
    snapshot_ticks: int = 25
    state_dump_ticks: int = 25
    log_img_ticks: int = 50
    seed: int = 2047813205
    run_dir: str = ""

    @staticmethod
    def from_yaml(file_path: str) -> "TransdimensionalEpicConfig":
        with open(file_path, "r") as f:
            data = yaml.safe_load(f)
        return TransdimensionalEpicConfig.from_dict(data)

    @staticmethod
    def from_dict(data: dict) -> "TransdimensionalEpicConfig":
        return TransdimensionalEpicConfig(
            data=_build(JetsDataConfig, data.get("data", {})),
            encoder=_build(EncoderConfig, data.get("encoder", {})),
            loss_kwargs=_build(LossKwargs, data.get("loss_kwargs", {})),
            optimizer_kwargs=_build(OptimizerKwargs, data.get("optimizer_kwargs", {})),
            structure_kwargs=_build(StructureKwargs, data.get("structure_kwargs", {})),
            sampler_kwargs=_build(SamplerKwargs, data.get("sampler_kwargs", {})),
            grad_conditioner_kwargs=_build(
                GradConditionerKwargs, data.get("grad_conditioner_kwargs", {})
            ),
            augment_kwargs=_build(AugmentKwargs, data.get("augment_kwargs", {})),
            parallel=_build(ParallelConfig, data.get("parallel", {})),
            just_visualize=data.get("just_visualize", False),
            distributed=data.get("distributed", False),
            device=data.get("device", "tpu"),
            total_kimg=data.get("total_kimg", 200000),
            ema_halflife_kimg=data.get("ema_halflife_kimg", 500),
            batch_size=data.get("batch_size", 64),
            batch_gpu=data.get("batch_gpu", None),
            loss_scaling=data.get("loss_scaling", 1.0),
            cudnn_benchmark=data.get("cudnn_benchmark", True),
            kimg_per_tick=data.get("kimg_per_tick", 50),
            snapshot_ticks=data.get("snapshot_ticks", 25),
            state_dump_ticks=data.get("state_dump_ticks", 25),
            log_img_ticks=data.get("log_img_ticks", 50),
            seed=data.get("seed", 2047813205),
            run_dir=data.get("run_dir", ""),
        )

    def to_yaml(self, file_path: str):
        with open(file_path, "w") as f:
            yaml.safe_dump(asdict(self), f, default_flow_style=False)

    def to_dict(self) -> dict:
        return asdict(self)
