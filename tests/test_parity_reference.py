"""Numerical parity against the actual torch reference implementation.

Transplants one set of weights between the torch reference modules and the
flax rebuild and asserts forward/loss equality, plus golden comparisons of
the bridge math on fixed inputs (VERDICT r1 item 2).

Reference: models/architectures/epic.py:93-241,
models/generative/bridges.py:106-286,
models/generative/multimodal_bridge_matching.py:167-197,
models/generative/diffusion/noising.py:7-78, utils/losses.py:9-35.

Skipped cleanly when torch or the reference mount is absent.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_particles_tpu.utils.torch_reference import (  # noqa: E402
    load_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

B, N = 4, 32
RTOL, ATOL = 1e-5, 1e-5


@pytest.fixture(scope="module")
def ref_pkg():
    return load_reference()


@pytest.fixture(scope="module")
def config_path():
    from multimodal_particles_tpu import test_resources_dir

    return os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


@pytest.fixture(scope="module")
def models(ref_pkg, config_path):
    """(flax model+params, torch model) with the torch weights transplanted
    into the flax param tree."""
    import jax
    import jax.numpy as jnp

    from multimodal_particles.config_classes.multimodal_bridge_matching_config import (
        MultimodalBridgeMatchingConfig as RefConfig,
    )
    from multimodal_particles.models.generative.multimodal_bridge_matching import (
        MultiModalBridgeMatching as RefMBM,
    )

    from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )
    from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
        MultiModalBridgeMatching,
    )

    cfg = MultimodalBridgeMatchingConfig.from_yaml(config_path)
    cfg.data.batch_size = B
    cfg.data.max_num_particles = N
    model = MultiModalBridgeMatching(cfg)
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    params = jax.device_get(model.init(jax.random.PRNGKey(0), batch))

    torch.manual_seed(0)
    ref_cfg = RefConfig.from_yaml(config_path)
    ref_model = RefMBM(ref_cfg)
    ref_model.eval()

    params = transplant_mbm(ref_model, params)
    return model, params, ref_model, cfg


def _wn(flax_leaf, torch_module):
    """Fill one WeightNormDense param dict from a torch weight_norm(Linear)."""
    flax_leaf["v"] = torch_module.weight_v.detach().numpy().T.copy()
    flax_leaf["g"] = torch_module.weight_g.detach().numpy().reshape(-1).copy()
    flax_leaf["bias"] = torch_module.bias.detach().numpy().copy()


def _dense(flax_leaf, torch_module):
    flax_leaf["kernel"] = torch_module.weight.detach().numpy().T.copy()
    flax_leaf["bias"] = torch_module.bias.detach().numpy().copy()


def transplant_mbm(ref_model, params):
    """torch reference MultiModalBridgeMatching → flax param tree."""
    enc = params["encoder"]
    t_enc = ref_model.encoder

    emb = enc["epic"]["embedding"]
    _dense(emb["embedding_continuous"], t_enc.epic.embedding.embedding_continuous)
    emb["embedding_discrete"]["embedding"] = (
        t_enc.epic.embedding.embedding_discrete.weight.detach().numpy().copy()
    )

    net = enc["epic"]["epic"]
    proj = t_enc.epic.epic.epic_proj
    _wn(net["epic_proj"]["local_0"], proj.local_0)
    _wn(net["epic_proj"]["global_0"], proj.global_0)
    _wn(net["epic_proj"]["global_1"], proj.global_1)
    _wn(net["epic_proj"]["global_2"], proj.global_2)
    for i, layer in enumerate(t_enc.epic.epic.epic_layers):
        blk = net[f"epic_layer_{i}"]
        _wn(blk["fc_global1"], layer.fc_global1)
        _wn(blk["fc_global2"], layer.fc_global2)
        _wn(blk["fc_local1"], layer.fc_local1)
        _wn(blk["fc_local2"], layer.fc_local2)
    _wn(net["output_layer"], t_enc.epic.epic.output_layer)

    if "fc_layer" in enc:
        _dense(enc["fc_layer"]["layers_0"], t_enc.fc_layer[0])
        _dense(enc["fc_layer"]["layers_2"], t_enc.fc_layer[2])

    params["loss_weights"] = (
        ref_model.loss_multihead.weights.detach().numpy().copy()
    )
    return params


def _fixed_state(seed=7):
    rng = np.random.default_rng(seed)
    t = np.full((B, 1, 1), 0.37, np.float32)
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    k = rng.integers(0, 8, (B, N, 1))
    mask = (rng.random((B, N, 1)) < 0.8).astype(np.float32)
    return t, x, k, mask


def _fixed_batch(seed=11):
    rng = np.random.default_rng(seed)
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        MultimodalDatabatch,
    )

    return MultimodalDatabatch(
        source_continuous=rng.standard_normal((B, N, 3)).astype(np.float32),
        source_discrete=rng.integers(0, 8, (B, N, 1)),
        source_mask=(rng.random((B, N, 1)) < 0.8).astype(np.int64),
        target_continuous=rng.standard_normal((B, N, 3)).astype(np.float32),
        target_discrete=rng.integers(0, 8, (B, N, 1)),
        target_mask=(rng.random((B, N, 1)) < 0.8).astype(np.int64),
    )


def _to_torch_batch(batch):
    cls = type(batch)
    return cls(
        **{
            k: (None if v is None else torch.from_numpy(np.asarray(v)))
            for k, v in batch._asdict().items()
        }
    )


def test_epic_forward_parity(models):
    """Transplanted weights ⇒ identical MultiModalEPiC heads
    (reference: epic.py:93-241)."""
    import jax.numpy as jnp

    from multimodal_particles_tpu.models.generative.states import HybridState

    model, params, ref_model, _ = models
    t, x, k, mask = _fixed_state()

    state = HybridState(
        time=jnp.asarray(t),
        continuous=jnp.asarray(x),
        discrete=jnp.asarray(k),
        absorbing=jnp.asarray(mask),
    )
    heads = model.forward(params, state, _fixed_batch())

    with torch.no_grad():
        tc, td, _ = ref_model.encoder(
            t=torch.from_numpy(t),
            x=torch.from_numpy(x),
            k=torch.from_numpy(k),
            mask=torch.from_numpy(mask),
        )

    np.testing.assert_allclose(
        np.asarray(heads.continuous), tc.numpy(), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(heads.discrete), td.numpy(), rtol=RTOL, atol=ATOL
    )


def test_mbm_loss_parity(models):
    """Identical fixed bridge state ⇒ identical per-head and combined losses
    (reference: multimodal_bridge_matching.py:167-197, losses.py:21-29)."""
    import jax.numpy as jnp

    from multimodal_particles_tpu.models.generative.states import HybridState
    from multimodal_particles_tpu.utils.losses import multihead_loss

    model, params, ref_model, _ = models
    t, x, k, mask = _fixed_state(seed=13)
    batch = _fixed_batch(seed=17)
    t = np.broadcast_to(
        np.random.default_rng(3).uniform(0.05, 0.95, (B, 1, 1)).astype(np.float32),
        (B, 1, 1),
    ).copy()

    state = HybridState(
        time=jnp.asarray(t),
        continuous=jnp.asarray(x),
        discrete=jnp.asarray(k),
        absorbing=jnp.asarray(batch.target_mask, jnp.float32),
    )
    jbatch = batch
    heads = model.forward(params, state, jbatch)
    l0 = float(model.loss_continuous(heads, state, jbatch))
    l1 = float(model.loss_discrete(heads, state, jbatch))
    combined, _ = multihead_loss(
        [jnp.asarray(l0), jnp.asarray(l1)], jnp.asarray(params["loss_weights"])
    )

    from multimodal_particles.models.generative.multimodal_bridge_matching import (
        HybridState as RefHybridState,
    )

    tb = _to_torch_batch(batch)
    rstate = RefHybridState(
        time=torch.from_numpy(t),
        continuous=torch.from_numpy(x),
        discrete=torch.from_numpy(k),
        absorbing=tb.target_mask.float(),
    )
    with torch.no_grad():
        rheads = ref_model.forward(rstate, tb)
        rl0 = float(ref_model.loss_continuous(rheads, rstate, tb))
        rl1 = float(ref_model.loss_discrete(rheads, rstate, tb))
        rcombined, _ = ref_model.loss_multihead([torch.tensor(rl0), torch.tensor(rl1)])

    assert abs(l0 - rl0) < 1e-5, (l0, rl0)
    assert abs(l1 - rl1) < 1e-5, (l1, rl1)
    assert abs(float(combined) - float(rcombined)) < 1e-5


def test_telegraph_probability_parity(models, ref_pkg):
    """Telegraph conditional + posterior transition probabilities match the
    torch formulas on fixed inputs (reference: bridges.py:134-177)."""
    import jax.numpy as jnp

    model, params, ref_model, cfg = models
    rng = np.random.default_rng(5)
    t = rng.uniform(0.05, 0.95, (B, 1, 1)).astype(np.float32)
    k0 = rng.integers(0, 8, (B, N, 1))
    k1 = rng.integers(0, 8, (B, N, 1))

    probs = np.asarray(
        model.bridge_discrete.transition_probability(
            jnp.asarray(t), jnp.asarray(k0), jnp.asarray(k1)
        )
    )
    with torch.no_grad():
        rprobs = ref_model.bridge_discrete.transition_probability(
            torch.from_numpy(t), torch.from_numpy(k0), torch.from_numpy(k1)
        ).numpy()
    np.testing.assert_allclose(probs, rprobs, rtol=1e-5, atol=1e-6)


def test_telegraph_rate_parity(models):
    """Reverse rate from logits matches (reference: bridges.py:106-132)."""
    import jax.numpy as jnp

    model, params, ref_model, _ = models
    rng = np.random.default_rng(9)
    t = rng.uniform(0.05, 0.95, (B, 1, 1)).astype(np.float32)
    k = rng.integers(0, 8, (B, N, 1))
    logits = rng.standard_normal((B, N, 8)).astype(np.float32)

    rate = np.asarray(
        model.bridge_discrete.rate(jnp.asarray(t), jnp.asarray(k), jnp.asarray(logits))
    )
    with torch.no_grad():
        rrate = ref_model.bridge_discrete.rate(
            torch.from_numpy(t.reshape(B, 1)),
            torch.from_numpy(k),
            torch.from_numpy(logits),
        ).numpy()
    np.testing.assert_allclose(rate, rrate, rtol=1e-5, atol=1e-6)


def test_linear_bridge_parity(models):
    """Linear-uniform drift matches the torch bridge
    (reference: bridges.py:23-33)."""
    import jax.numpy as jnp

    model, params, ref_model, _ = models
    rng = np.random.default_rng(21)
    t = rng.uniform(0.0, 1.0, (B, 1, 1)).astype(np.float32)
    x0 = rng.standard_normal((B, N, 3)).astype(np.float32)
    x1 = rng.standard_normal((B, N, 3)).astype(np.float32)
    x = rng.standard_normal((B, N, 3)).astype(np.float32)

    drift = np.asarray(
        model.bridge_continuous.drift(jnp.asarray(t), jnp.asarray(x), jnp.asarray(x0), jnp.asarray(x1))
    )
    with torch.no_grad():
        rdrift = ref_model.bridge_continuous.drift(
            torch.from_numpy(t), torch.from_numpy(x), torch.from_numpy(x0), torch.from_numpy(x1)
        ).numpy()
    np.testing.assert_allclose(drift, rdrift, rtol=1e-6, atol=1e-6)


def test_absorbing_bridge_parity(ref_pkg, config_path):
    """Absorbing survival probability and rate match the torch formulas
    (reference: bridges.py:218-258)."""
    import jax.numpy as jnp

    from multimodal_particles.config_classes.absorbing_flows_config import (
        AbsorbingConfig as RefAbsorbingConfig,
    )
    from multimodal_particles.models.generative.bridges import (
        AbsorbingBridge as RefAbsorbingBridge,
    )

    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.models.generative.bridges import AbsorbingBridge

    cfg = AbsorbingConfig()
    bridge = AbsorbingBridge.from_config(cfg)
    ref_bridge = RefAbsorbingBridge(RefAbsorbingConfig())

    rng = np.random.default_rng(31)
    t = rng.uniform(0.02, 0.98, (B,)).astype(np.float32)
    sp = np.asarray(bridge.survival_probability(jnp.asarray(t)))
    with torch.no_grad():
        rsp = ref_bridge.survival_probability(torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(sp, rsp, rtol=1e-5, atol=1e-6)

    t2 = rng.uniform(0.02, 0.98, (B, 1, 1)).astype(np.float32)
    k = rng.integers(0, 2, (B, N, 1))
    logits = rng.standard_normal((B, N, 1)).astype(np.float32)
    # my rate broadcasts t as (B,1,1) (state.time); the torch one takes (B,1)
    rate = np.asarray(
        bridge.rate(jnp.asarray(t2), jnp.asarray(k), jnp.asarray(logits))
    )
    with torch.no_grad():
        rrate = ref_bridge.rate(
            torch.from_numpy(t2[:, 0]), torch.from_numpy(k), torch.from_numpy(logits)
        ).numpy()
    np.testing.assert_allclose(rate, rrate, rtol=1e-5, atol=1e-6)


def test_vp_sde_parity(ref_pkg):
    """VP-SDE p0t / transition stats match the torch formulas
    (reference: diffusion/noising.py:15-78)."""
    import jax.numpy as jnp

    from multimodal_particles.models.generative.diffusion.noising import (
        VP_SDE as RefVPSDE,
    )

    from multimodal_particles_tpu.models.generative.diffusion.noising import VP_SDE

    D = 12
    sde = VP_SDE(max_dim=D, beta_min=0.1, beta_max=20.0)
    ref_sde = RefVPSDE(max_dim=D, beta_min=0.1, beta_max=20.0)

    rng = np.random.default_rng(41)
    ts = rng.uniform(0.01, 0.99, (B,)).astype(np.float32)
    lats = rng.standard_normal((B, D)).astype(np.float32)

    mean, std = sde.get_p0t_stats(jnp.asarray(lats), jnp.asarray(ts))
    shim = SimpleNamespace(get_flat_lats=lambda: torch.from_numpy(lats))
    with torch.no_grad():
        rmean, rstd = ref_sde.get_p0t_stats(shim, torch.from_numpy(ts))
    np.testing.assert_allclose(np.asarray(mean), rmean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), rstd.numpy(), rtol=1e-5, atol=1e-6)

    t1 = rng.uniform(0.01, 0.5, (B,)).astype(np.float32)
    t2 = t1 + rng.uniform(0.01, 0.4, (B,)).astype(np.float32)
    mean2, std2 = sde.get_pxt2_xt1_stats(jnp.asarray(lats), jnp.asarray(t1), jnp.asarray(t2))
    with torch.no_grad():
        rmean2, rstd2 = ref_sde.get_pxt2_xt1_stats(
            shim, torch.from_numpy(t1), torch.from_numpy(t2)
        )
    np.testing.assert_allclose(np.asarray(mean2), rmean2.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std2), rstd2.numpy(), rtol=1e-5, atol=1e-6)

    beta = np.asarray(sde.get_beta_t(jnp.asarray(ts)))
    with torch.no_grad():
        rbeta = ref_sde.get_beta_t(torch.from_numpy(ts)).numpy()
    np.testing.assert_allclose(beta, rbeta, rtol=1e-6, atol=1e-7)


def test_multihead_loss_parity(ref_pkg):
    """Learnable uncertainty-weighted combine matches
    (reference: utils/losses.py:21-29)."""
    import jax.numpy as jnp

    from multimodal_particles.utils.losses import MultiHeadLoss as RefMultiHeadLoss

    from multimodal_particles_tpu.utils.losses import multihead_loss

    weights = np.array([0.3, -0.7], np.float32)
    losses = [2.5, 1.25]

    combined, per_head = multihead_loss(
        [jnp.asarray(v) for v in losses], jnp.asarray(weights)
    )

    ref_loss = RefMultiHeadLoss(mode="learnable")
    with torch.no_grad():
        ref_loss.weights.copy_(torch.from_numpy(weights))
        rcombined, _ = ref_loss([torch.tensor(v) for v in losses])
    assert abs(float(combined) - float(rcombined)) < 1e-6


def _conv1(flax_leaf, torch_conv):
    """torch Conv1d(k=1) (out,in,1) → flax Dense kernel (in,out)."""
    flax_leaf["kernel"] = torch_conv.weight.detach().numpy()[:, :, 0].T.copy()
    flax_leaf["bias"] = torch_conv.bias.detach().numpy().copy()


def _gn(flax_leaf, torch_gn):
    flax_leaf["scale"] = torch_gn.weight.detach().numpy().copy()
    flax_leaf["bias"] = torch_gn.bias.detach().numpy().copy()


def test_gsdm_resnet_block_parity(ref_pkg):
    """ResnetBlock((B,N,C) flax) matches torch ResnetBlock((B,C,N))
    with transplanted weights (reference: gsdm.py:38-66)."""
    import jax
    import jax.numpy as jnp

    from multimodal_particles.models.architectures.gsdm import (
        ResnetBlock as RefResnetBlock,
    )

    from multimodal_particles_tpu.models.architectures.gsdm import ResnetBlock

    C, TC, n = 64, 32, 16
    torch.manual_seed(1)
    ref_blk = RefResnetBlock(channels=C, dropout=0.0, temb_channels=TC)
    ref_blk.eval()

    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, n, C)).astype(np.float32)
    temb = rng.standard_normal((B, TC)).astype(np.float32)

    blk = ResnetBlock(channels=C, dropout=0.0, temb_channels=TC)
    params = jax.device_get(
        blk.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))
    )["params"]
    _gn(params["norm1"], ref_blk.norm1)
    _conv1(params["conv1"], ref_blk.conv1)
    _conv1(params["temb_proj"], ref_blk.temb_proj)
    _gn(params["norm2"], ref_blk.norm2)
    _conv1(params["conv2"], ref_blk.conv2)

    out = np.asarray(blk.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb)))
    with torch.no_grad():
        # torch layout is channel-first: (B, C, N)
        rout = (
            ref_blk(
                torch.from_numpy(x).permute(0, 2, 1),
                torch.from_numpy(temb)[:, :, None],
            )
            .permute(0, 2, 1)
            .numpy()
        )
    np.testing.assert_allclose(out, rout, rtol=1e-4, atol=1e-5)


def test_gsdm_attn_block_parity(ref_pkg):
    """AttnBlock((B,N,C) flax) matches torch AttnBlock((B,C,N)) with
    transplanted weights, unmasked (reference: gsdm.py:69-168)."""
    import jax
    import jax.numpy as jnp

    from multimodal_particles.models.architectures.gsdm import (
        AttnBlock as RefAttnBlock,
    )

    from multimodal_particles_tpu.models.architectures.gsdm import AttnBlock

    C, n, heads = 64, 16, 4
    torch.manual_seed(3)
    ref_blk = RefAttnBlock(in_channels=C, n_heads=heads)
    ref_blk.eval()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, n, C)).astype(np.float32)

    blk = AttnBlock(in_channels=C, n_heads=heads)
    params = jax.device_get(blk.init(jax.random.PRNGKey(0), jnp.asarray(x)))["params"]
    _gn(params["norm"], ref_blk.norm)
    _conv1(params["q"], ref_blk.q)
    _conv1(params["k"], ref_blk.k)
    _conv1(params["v"], ref_blk.v)
    _conv1(params["proj_out"], ref_blk.proj_out)

    out = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        rout = (
            ref_blk(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        )
    np.testing.assert_allclose(out, rout, rtol=1e-4, atol=1e-5)


def test_gsdm_timestep_embedding_parity(ref_pkg):
    """DDPM timestep embedding matches (reference: gsdm.py:8-26)."""
    import jax.numpy as jnp

    from multimodal_particles.models.architectures.gsdm import (
        get_timestep_embedding as ref_emb,
    )

    from multimodal_particles_tpu.models.architectures.utils import (
        get_timestep_embedding,
    )

    ts = np.linspace(0.0, 1.0, 7).astype(np.float32)
    mine = np.asarray(get_timestep_embedding(jnp.asarray(ts), 32))
    with torch.no_grad():
        theirs = ref_emb(torch.from_numpy(ts), 32).numpy()
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-6)


def test_forward_rate_parity(ref_pkg):
    """Step/Const forward deletion rates match the torch reference
    (reference: noising.py:80-164): scalar calibration, pointwise rate,
    and the closed-form rate integral."""
    import jax.numpy as jnp

    from multimodal_particles.models.generative.diffusion.noising import (
        ConstForwardRate as RefConst,
        StepForwardRate as RefStep,
    )

    from multimodal_particles_tpu.models.generative.diffusion.noising import (
        ConstForwardRate,
        StepForwardRate,
    )

    ts = np.linspace(0.01, 0.99, 13).astype(np.float32)
    for max_dim in (16, 128):
        mine = StepForwardRate(max_dim=max_dim, rate_cut_t=0.1)
        ref = RefStep(max_dim=max_dim, rate_cut_t=0.1)
        np.testing.assert_allclose(mine.get_scalar(), ref.get_scalar(), rtol=1e-6)
        with torch.no_grad():
            np.testing.assert_allclose(
                np.asarray(mine.get_rate(None, jnp.asarray(ts))),
                ref.get_rate(None, torch.from_numpy(ts)).numpy(),
                rtol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(mine.get_rate_integral(jnp.asarray(ts))),
                ref.get_rate_integral(torch.from_numpy(ts)).numpy(),
                rtol=1e-5,
            )
        minec = ConstForwardRate(max_dim=max_dim)
        refc = RefConst(max_dim=max_dim, scalar=None)
        np.testing.assert_allclose(minec.get_scalar(), refc.get_scalar(), rtol=1e-6)
        with torch.no_grad():
            np.testing.assert_allclose(
                np.asarray(minec.get_rate_integral(jnp.asarray(ts))),
                refc.get_rate_integral(torch.from_numpy(ts)).numpy(),
                rtol=1e-5,
            )


def test_get_rate_using_x0_pred_parity(ref_pkg):
    """The vectorized reverse birth rate matches the reference's per-sample
    loop implementation, including the d_x = 1 truncated-logsumexp branch
    and the d_x = max_dim boundary (reference: noising.py:166-215)."""
    import jax.numpy as jnp

    from multimodal_particles.models.generative.diffusion.noising import (
        StepForwardRate as RefStep,
        get_rate_using_x0_pred as ref_rate,
    )

    from multimodal_particles_tpu.models.generative.diffusion.noising import (
        StepForwardRate,
        get_rate_using_x0_pred,
    )

    max_dim = 24
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((8, max_dim)).astype(np.float32) * 3.0
    # cover: the dims=1 branch, interior dims, and the max_dim boundary
    xt_dims = np.array([1, 1, 2, 3, 12, 23, 24, 24], np.int64)
    ts = rng.uniform(0.05, 0.95, 8).astype(np.float32)

    mine = StepForwardRate(max_dim=max_dim, rate_cut_t=0.1)
    ref_fr = RefStep(max_dim=max_dim, rate_cut_t=0.1)

    got = np.asarray(
        get_rate_using_x0_pred(
            jnp.asarray(logits), jnp.asarray(xt_dims), mine,
            jnp.asarray(ts), max_dim,
        )
    )
    with torch.no_grad():
        want = ref_rate(
            torch.from_numpy(logits),
            torch.from_numpy(xt_dims),
            ref_fr,
            torch.from_numpy(ts),
            max_dim,
        ).numpy()
    np.testing.assert_allclose(got, want.reshape(-1), rtol=2e-4, atol=1e-6)


@pytest.fixture(scope="module")
def transdim_pair(ref_pkg, request):
    """(flax model+params, torch model, shared batch/facade) with the torch
    weights transplanted into the flax tree, in the reference's
    Embedding-discrete + flat ("dims") score-normalization mode — the exact
    reference-semantics combination (reference:
    transdimensional_model.py:135-452)."""
    import jax

    from multimodal_particles.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig as RefTCfg,
    )
    from multimodal_particles.models.generative.transdimensional.structure import (
        StructuredDataBatch as RefSDB,
    )
    from multimodal_particles.models.generative.transdimensional.transdimensional_model import (
        TransdimensionalJumpDiffusion as RefTJD,
    )

    # must come AFTER the model imports: the reference's jets_dataloader and
    # absorbing_flows import each other circularly and only resolve when the
    # model side initiates the chain
    from multimodal_particles.data.particle_clouds.jets_dataloader import (
        JetsGraphicalStructure as RefJGS,
    )

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        state_from_list_batch,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.transdimensional_model import (
        TransdimensionalJumpDiffusion,
    )

    # ---- shared small config (both sides identical)
    Np, Bt, C, blocks = 24, 8, 32, 1
    cfg = TransdimensionalEpicConfig()
    cfg.data.return_type = "list"
    cfg.data.num_jets = 100
    cfg.data.max_num_particles = Np
    cfg.data.batch_size = Bt
    cfg.encoder.transformer_dim = C
    cfg.encoder.n_attn_blocks = blocks
    cfg.encoder.embedding_features_discrete = "Embedding"  # reference mode
    cfg.loss_kwargs.score_loss_normalization = "dims"  # reference mode
    cfg.sampler_kwargs.multi_birth = 1  # reference single-birth semantics

    jets = JetDataclass(config=cfg)
    jets.preprocess()
    dm = JetsDataloaderModule(config=cfg, jetdataset=jets)
    batch = next(iter(dm.train))
    dims_np = np.asarray(batch[0])
    data_np = [np.asarray(t, np.float32) for t in batch[1:]]

    model = TransdimensionalJumpDiffusion(cfg, dm)
    state = state_from_list_batch(batch)
    params = jax.device_get(model.init(jax.random.PRNGKey(0), state))

    # ---- torch side: reference model over a minimal datamodule facade
    ref_cfg = RefTCfg()
    ref_cfg.data.max_num_particles = Np
    ref_cfg.data.batch_size = Bt
    ref_cfg.encoder.transformer_dim = C
    ref_cfg.encoder.n_attn_blocks = blocks

    fake_dm = SimpleNamespace(
        config=ref_cfg,
        histogram_target={int(k): int(v) for k, v in dm.histogram_target.items()},
        names_in_batch=list(dm.names_in_batch),
        name_to_index=dict(dm.name_to_index),
        observed=np.asarray(dm.observed),
        exist=np.asarray(dm.exist),
        is_onehot=list(np.asarray(dm.is_onehot)),
        with_onehot_shapes=[torch.Size(s) for s in dm.with_onehot_shapes],
        without_onehot_shapes=[torch.Size(s) for s in dm.without_onehot_shapes],
    )
    fake_dm.graphical_structure = RefJGS(fake_dm)
    # upstream latent bug: the reference loss/sampler read
    # gs.max_problem_dim (sampler.py:168, jets_dataloader.py:483) but
    # JetsGraphicalStructure never defines it — these paths never executed
    # upstream; for jets it is the particle-slot count
    fake_dm.graphical_structure.max_problem_dim = Np

    # upstream latent bug: the token decode uses `F.softmax(one_hot)` with
    # the IMPLICIT dim (structure.py:231), which on a 3-D tensor is dim=0 —
    # the BATCH axis — so each sample's tokens depend on the rest of the
    # batch. Harmless on clean one-hots (argmax usually survives) but wrong
    # on noised channels, where the author's evident intent (per-vocab
    # softmax, = plain argmax) and the batch-softmax decode diverge. The
    # rebuild uses plain per-row argmax; pin the reference to the intended
    # semantics for the comparison.
    _orig_to_mbd = RefSDB.from_st_batch_to_multimodal_bridge_databatch

    def _fixed_to_mbd(self):
        one_hot, _, tc, cc, cd, mask = _orig_to_mbd(self)
        target_discrete = torch.argmax(one_hot, dim=-1).unsqueeze(-1)
        return one_hot, target_discrete, tc, cc, cd, mask

    RefSDB.from_st_batch_to_multimodal_bridge_databatch = _fixed_to_mbd
    # restore the real decode after this module: later tests must not
    # silently inherit the pinned semantics
    request.addfinalizer(
        lambda: setattr(
            RefSDB, "from_st_batch_to_multimodal_bridge_databatch",
            _orig_to_mbd,
        )
    )

    torch.manual_seed(0)
    ref_model = RefTJD(ref_cfg, fake_dm)
    ref_model.eval()
    ref_net = ref_model.net.model  # TransdimensionalEPiC

    # ---- transplant torch → flax
    net_p = params["network"]
    emb = net_p["epic"]["embedding"]
    _dense(emb["embedding_continuous"], ref_net.epic.embedding.embedding_continuous)
    emb["embedding_discrete"]["embedding"] = (
        ref_net.epic.embedding.embedding_discrete.weight.detach().numpy().copy()
    )
    epic = net_p["epic"]["epic"]
    proj = ref_net.epic.epic.epic_proj
    _wn(epic["epic_proj"]["local_0"], proj.local_0)
    _wn(epic["epic_proj"]["global_0"], proj.global_0)
    _wn(epic["epic_proj"]["global_1"], proj.global_1)
    _wn(epic["epic_proj"]["global_2"], proj.global_2)
    for i, layer in enumerate(ref_net.epic.epic.epic_layers):
        blk = epic[f"epic_layer_{i}"]
        _wn(blk["fc_global1"], layer.fc_global1)
        _wn(blk["fc_global2"], layer.fc_global2)
        _wn(blk["fc_local1"], layer.fc_local1)
        _wn(blk["fc_local2"], layer.fc_local2)
    _wn(epic["output_layer"], ref_net.epic.epic.output_layer)
    # (the reference defines an add_discrete_head fc_layer but never calls
    # it in forward — dead weights, deliberately omitted in the rebuild)

    _dense(net_p["temb_net"], ref_net.temb_net)
    _dense(net_p["transformer_1_proj_in"], ref_net.transformer_1_proj_in)
    for i in range(blocks):
        r, a = ref_net.res_blocks[i], ref_net.attn_blocks[i]
        _gn(net_p[f"res_{i}"]["norm1"], r.norm1)
        _conv1(net_p[f"res_{i}"]["conv1"], r.conv1)
        _conv1(net_p[f"res_{i}"]["temb_proj"], r.temb_proj)
        _gn(net_p[f"res_{i}"]["norm2"], r.norm2)
        _conv1(net_p[f"res_{i}"]["conv2"], r.conv2)
        _gn(net_p[f"attn_{i}"]["norm"], a.norm)
        _conv1(net_p[f"attn_{i}"]["q"], a.q)
        _conv1(net_p[f"attn_{i}"]["k"], a.k)
        _conv1(net_p[f"attn_{i}"]["v"], a.v)
        _conv1(net_p[f"attn_{i}"]["proj_out"], a.proj_out)
        rv, av = ref_net.vec_res_blocks[i], ref_net.vec_attn_blocks[i]
        _gn(net_p[f"vec_res_{i}"]["norm1"], rv.norm1)
        _conv1(net_p[f"vec_res_{i}"]["conv1"], rv.conv1)
        _conv1(net_p[f"vec_res_{i}"]["temb_proj"], rv.temb_proj)
        _gn(net_p[f"vec_res_{i}"]["norm2"], rv.norm2)
        _conv1(net_p[f"vec_res_{i}"]["conv2"], rv.conv2)
        _gn(net_p[f"vec_attn_{i}"]["norm"], av.norm)
        _conv1(net_p[f"vec_attn_{i}"]["q"], av.q)
        _conv1(net_p[f"vec_attn_{i}"]["k"], av.k)
        _conv1(net_p[f"vec_attn_{i}"]["v"], av.v)
        _conv1(net_p[f"vec_attn_{i}"]["proj_out"], av.proj_out)
    _dense(net_p["pre_rate_proj"], ref_net.pre_rate_proj)
    _dense(net_p["post_rate_proj"], ref_net.post_rate_proj)
    _dense(net_p["near_atom_proj"], ref_net.near_atom_proj)
    _dense(net_p["vec_transformer_in_proj"], ref_net.vec_transformer_in_proj)
    _dense(net_p["vec_weighting_proj"], ref_net.vec_weighting_proj)
    _dense(net_p["pre_auto_proj"], ref_net.pre_auto_proj)
    _dense(net_p["post_auto_proj"], ref_net.post_auto_proj)

    def make_ref_st_batch(data=None, dims=None):
        sdb = RefSDB(
            [torch.from_numpy(np.array(t)) for t in (data or data_np)],
            torch.from_numpy(np.array(dims if dims is not None else dims_np)),
            fake_dm.observed,
            fake_dm.exist,
            fake_dm.is_onehot,
            fake_dm.graphical_structure,
        )
        # upstream latent attribute: get_auto_target reads
        # st_batch.target_continuous_dim (jets_dataloader.py:486) but
        # StructuredDataBatch never sets it — the loss path never executed
        # upstream; it is the continuous feature dim
        sdb.target_continuous_dim = int(state.Dc)
        sdb.target_discrete_dim = int(state.V)
        return sdb

    return SimpleNamespace(
        cfg=cfg,
        model=model,
        params=params,
        state=state,
        ref_model=ref_model,
        ref_cfg=ref_cfg,
        fake_dm=fake_dm,
        dm=dm,
        dims_np=dims_np,
        data_np=data_np,
        make_ref_st_batch=make_ref_st_batch,
        Bt=Bt,
        Np=Np,
    )


def test_transdimensional_net_forward_parity(transdim_pair):
    """Transplanted weights ⇒ identical TransdimensionalEPiC outputs
    (D_xt, reverse rate, creation mean/std, x0-dim logits, nearest-atom
    logits) between the torch reference and the flax rebuild, in the
    reference's Embedding-discrete mode
    (reference: transdimensional_model.py:135-452)."""
    import jax.numpy as jnp

    p = transdim_pair
    model, params, state, ref_model = p.model, p.params, p.state, p.ref_model
    Bt = p.Bt

    # ---- identical fixed inputs through both nets
    ts = np.full((Bt,), 0.4, np.float32)
    nearest = np.zeros((Bt,), np.int64)

    D, rate, (amean, astd), x0_logits, near_logits, _ = model.net_forward(
        params,
        state,
        jnp.asarray(ts),
        nearest_atom=jnp.asarray(nearest, jnp.int32),
        predict="eps",
    )

    st_batch = p.make_ref_st_batch()
    with torch.no_grad():
        rD, rrate, rms, rx0, rnear = ref_model.net(
            st_batch,
            torch.from_numpy(ts),
            predict="eps",
            forward_rate=ref_model.forward_rate,
            nearest_atom=torch.from_numpy(nearest),
        )

    np.testing.assert_allclose(
        np.asarray(D), rD.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rate).reshape(-1), rrate.numpy().reshape(-1),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(x0_logits), rx0.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(near_logits), rnear.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(amean), rms[0].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(astd), rms[1].numpy(), rtol=1e-4, atol=1e-4
    )


def test_transdim_assembled_loss_parity(transdim_pair):
    """Identical corruption draws ⇒ the assembled `JumpLossFinalDim` —
    forward corruption, both network passes, and every loss term
    (score/rate/auto/CE/nearest-atom), the NaN-row handling, and the final
    reduction — matches the torch reference in reference-semantics mode
    (reference: transdimensional/loss.py:84-251). Guards the deliberate
    default divergence (score_loss_normalization='live'): this pins the
    'dims' compat combination."""
    import unittest.mock as mock

    import jax.numpy as jnp

    from multimodal_particles_tpu.models.generative.transdimensional.loss import (
        corrupt_with,
    )

    p = transdim_pair
    B = p.Bt
    rng = np.random.default_rng(7)

    u_np = rng.uniform(size=(B,)).astype(np.float32)
    x0_dims = p.dims_np.astype(np.int64)
    # varied deletions incl. a no-delete row; dims_xt >= 2 throughout: the
    # reference's own masking assertion (loss.py:164) fails at dims_xt==1 —
    # the upstream-broken one-particle regime its skipped test names
    # ("PROBLEM WITH INTERPOLATION TO ONE PARTICLE"); the rebuild's dims==1
    # handling is covered by tests/test_generative/test_transdimensional.py
    drop = rng.integers(0, 6, size=(B,))
    dims_xt_np = np.clip(x0_dims - drop, 2, None).astype(np.int64)
    dims_xt_np[1] = x0_dims[1]
    flat_dim = int(p.state.flat_dim)
    noise_np = rng.standard_normal((B, flat_dim)).astype(np.float32)

    jl = p.model.jump_diffusion_loss
    ts_np = (jl.min_t + (1.0 - jl.min_t) * u_np).astype(np.float32)

    corrupted = corrupt_with(
        p.state,
        p.model.noise_schedule,
        jnp.asarray(ts_np),
        jnp.asarray(dims_xt_np, jnp.int32),
        jnp.asarray(noise_np),
    )
    loss, comps = jl.compute(p.model, p.params, corrupted)

    # --- torch side: full reference __call__ with the draws pinned by
    # patching its three randomness sources (loss.py:22,25,36)
    ref_loss_obj = p.ref_model.jump_diffusion_loss
    st_batch = p.make_ref_st_batch()
    orig_get_dims = ref_loss_obj.forward_rate.get_dims_at_t
    ref_loss_obj.forward_rate.get_dims_at_t = (
        lambda start_dims, ts: torch.from_numpy(dims_xt_np).float()
    )
    try:
        with mock.patch.object(
            torch, "rand", lambda *a, **k: torch.from_numpy(u_np)
        ), mock.patch.object(
            torch,
            "randn_like",
            lambda t, **k: torch.from_numpy(noise_np).to(t.dtype),
        ), torch.no_grad():
            ref_loss_t, ref_comps = ref_loss_obj(p.ref_model.net, st_batch)
    finally:
        ref_loss_obj.forward_rate.get_dims_at_t = orig_get_dims

    assert float(comps["num_valid"]) == B
    want_comps = {
        "score_loss": ref_comps["score_loss"].sum(dim=1).mean().item(),
        "rate_loss": ref_comps["rate_loss"].mean().item(),
        "auto_loss": ref_comps["auto_loss"].mean().item(),
        "ce_loss": ref_comps["ce_loss"].mean().item(),
        "nearest_atom_loss": ref_comps["nearest_atom_loss"].mean().item(),
        "max_rate_xt": ref_comps["max_rate_xt"].item(),
        "min_rate_delxt": ref_comps["min_rate_delxt"].item(),
        "min_auto_std": ref_comps["min_auto_std"].item(),
        "max_auto_L2": ref_comps["max_auto_L2"].item(),
    }
    for name, want_v in want_comps.items():
        np.testing.assert_allclose(
            float(comps[name]), want_v, rtol=2e-3, atol=2e-4, err_msg=name
        )

    # reference returns the (B, D) per-element loss; row-sum + batch-mean is
    # the scalar my compute() produces
    want = ref_loss_t.sum(dim=1).mean().item()
    np.testing.assert_allclose(float(loss), want, rtol=1e-3, atol=1e-4)


def test_transdim_sampler_step_parity(transdim_pair):
    """Identical random draws ⇒ the EM + single-birth jump reverse steps
    (a 2-step dt=0.6 grid: one interior step + one will_finish step with
    the no-noise gate) produce the same final lats/dims as the torch
    reference's `JumpSampler.sample` loop
    (reference: transdimensional/sampler.py:157-324)."""
    import dataclasses

    import jax

    from multimodal_particles.models.generative.transdimensional.sampler import (
        JumpSampler as RefJumpSampler,
    )

    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        JumpSampler,
    )

    p = transdim_pair
    B = p.Bt
    flat_dim = int(p.state.flat_dim)

    sk = dataclasses.replace(
        p.cfg.sampler_kwargs,
        dt=0.6,
        dt_schedule="uniform",
        sample_near_atom=False,
        no_noise_final_step=True,
        corrector_steps=0,
        multi_birth=1,
    )

    rng = np.random.default_rng(11)
    T = 2  # ts = [1.0, 0.4], finish_at = 0.3
    init_np = rng.standard_normal((B, flat_dim)).astype(np.float32)
    em_np = rng.standard_normal((T, B, flat_dim)).astype(np.float32)
    u_np = rng.uniform(size=(T, B)).astype(np.float32)
    # generous u so some births actually fire (rate*dt is O(1) here)
    u_np[:, ::2] *= 0.05
    bn_np = rng.standard_normal((T, B, flat_dim)).astype(np.float32)

    sampler = JumpSampler(sk)
    state, nfe = sampler.sample(
        p.model,
        p.params,
        p.state,
        jax.random.PRNGKey(0),
        test_draws={
            "init": init_np,
            "em_noise": em_np,
            "u_jump": u_np,
            "birth_noise": bn_np,
        },
    )
    assert nfe == T

    class _FakeRnd:
        """Replays the recorded draws through the reference's
        StackedRandomGenerator API (sampler.py:174,223,239,246)."""

        def __init__(self):
            self.randn_q = [init_np] + [
                a for t in range(T) for a in (em_np[t], bn_np[t])
            ]
            self.rand_q = [u_np[t] for t in range(T)]

        def randn_like(self, t):
            a = self.randn_q.pop(0)
            assert tuple(t.shape) == a.shape
            return torch.from_numpy(a).to(t.dtype)

        def rand(self, shape, device=None):
            return torch.from_numpy(self.rand_q.pop(0))

        def multinomial(self, probs, num_samples=1):
            # pinned nearest-atom draw = atom 0 on both sides (the rebuild
            # runs sample_near_atom=False, whose nearest_atom is zeros; the
            # reference's False path is broken upstream — its net asserts
            # nearest_atom is not None, transdimensional_model.py:341)
            return torch.zeros((probs.shape[0], num_samples), dtype=torch.long)

    from multimodal_particles.models.generative.transdimensional.transdimensional_model import (
        EpsilonPrecond as RefEps,
    )

    # upstream latent bug: the sampler's get_score passes
    # sample_nearest_atom/rnd through `net` (sampler.py:93) but
    # EpsilonPrecond.forward doesn't accept or forward them
    # (transdimensional_model.py:124) — the sampler never executed
    # upstream; forward the kwargs to the inner net, which does accept
    # them (transdimensional_model.py:245-247)
    def _eps_forward(
        self,
        st_batch,
        ts,
        predict="eps",
        forward_rate=None,
        nearest_atom=None,
        sample_nearest_atom=False,
        rnd=None,
    ):
        assert predict == "eps"
        return self.model(
            st_batch,
            ts,
            nearest_atom=nearest_atom,
            sample_nearest_atom=sample_nearest_atom,
            forward_rate=forward_rate,
            rnd=rnd,
        )

    ref_sampler = RefJumpSampler(
        p.ref_model.structure,
        dt=sk.dt,
        corrector_steps=0,
        corrector_snr=sk.corrector_snr,
        corrector_start_time=sk.corrector_start_time,
        corrector_finish_time=sk.corrector_finish_time,
        do_conditioning=False,
        condition_type=sk.condition_type,
        condition_sweep_idx=sk.condition_sweep_idx,
        condition_sweep_path=sk.condition_sweep_path,
        guidance_weight=sk.guidance_weight,
        do_jump_corrector=False,
        sample_near_atom=True,  # False is broken upstream; see _FakeRnd.multinomial
        dt_schedule="uniform",
        dt_schedule_h=sk.dt_schedule_h,
        dt_schedule_l=sk.dt_schedule_l,
        dt_schedule_tc=sk.dt_schedule_tc,
        no_noise_final_step=True,
    )
    import unittest.mock as mock

    with mock.patch.object(RefEps, "forward", _eps_forward), torch.no_grad():
        ref_final = ref_sampler.sample(
            p.ref_model.net,
            p.make_ref_st_batch(),
            p.ref_model.jump_diffusion_loss,
            _FakeRnd(),
        )

    ref_dims = ref_final.get_dims().numpy()
    got_dims = np.asarray(state.dims)
    np.testing.assert_array_equal(got_dims, ref_dims)
    np.testing.assert_allclose(
        np.asarray(state.get_flat_lats()),
        ref_final.get_flat_lats().numpy(),
        rtol=2e-3,
        atol=5e-4,
    )
    # at least one birth must have fired for the creation path to be tested
    assert got_dims.max() > 1


def transplant_absorbing_generator(ref_gen, gen_p, blocks):
    """torch reference AbsorbingGenerator → flax generator param tree."""
    emb = gen_p["epic"]["embedding"]
    _dense(emb["embedding_continuous"], ref_gen.epic.embedding.embedding_continuous)
    emb["embedding_discrete"]["embedding"] = (
        ref_gen.epic.embedding.embedding_discrete.weight.detach().numpy().copy()
    )
    epic = gen_p["epic"]["epic"]
    proj = ref_gen.epic.epic.epic_proj
    _wn(epic["epic_proj"]["local_0"], proj.local_0)
    _wn(epic["epic_proj"]["global_0"], proj.global_0)
    _wn(epic["epic_proj"]["global_1"], proj.global_1)
    _wn(epic["epic_proj"]["global_2"], proj.global_2)
    for i, layer in enumerate(ref_gen.epic.epic.epic_layers):
        blk = epic[f"epic_layer_{i}"]
        _wn(blk["fc_global1"], layer.fc_global1)
        _wn(blk["fc_global2"], layer.fc_global2)
        _wn(blk["fc_local1"], layer.fc_local1)
        _wn(blk["fc_local2"], layer.fc_local2)
    _wn(epic["output_layer"], ref_gen.epic.epic.output_layer)

    if "discrete_head_mlp" in gen_p:
        _dense(gen_p["discrete_head_mlp"]["layers_0"], ref_gen.discrete_head_mlp[0])
        _dense(gen_p["discrete_head_mlp"]["layers_2"], ref_gen.discrete_head_mlp[2])

    _dense(gen_p["temb_net"], ref_gen.temb_net)
    _dense(gen_p["transformer_1_proj_in"], ref_gen.transformer_1_proj_in)
    for i in range(blocks):
        r, a = ref_gen.res_blocks[i], ref_gen.attn_blocks[i]
        _gn(gen_p[f"res_block_{i}"]["norm1"], r.norm1)
        _conv1(gen_p[f"res_block_{i}"]["conv1"], r.conv1)
        _conv1(gen_p[f"res_block_{i}"]["temb_proj"], r.temb_proj)
        _gn(gen_p[f"res_block_{i}"]["norm2"], r.norm2)
        _conv1(gen_p[f"res_block_{i}"]["conv2"], r.conv2)
        _gn(gen_p[f"attn_block_{i}"]["norm"], a.norm)
        _conv1(gen_p[f"attn_block_{i}"]["q"], a.q)
        _conv1(gen_p[f"attn_block_{i}"]["k"], a.k)
        _conv1(gen_p[f"attn_block_{i}"]["v"], a.v)
        _conv1(gen_p[f"attn_block_{i}"]["proj_out"], a.proj_out)
    _dense(gen_p["pre_rate_proj"], ref_gen.pre_rate_proj)
    _dense(gen_p["post_rate_proj"], ref_gen.post_rate_proj)


def test_absorbing_generator_forward_parity(ref_pkg, config_path):
    """Transplanted weights ⇒ identical AbsorbingGenerator heads
    (continuous slice, discrete MLP head, survival logits) between the
    torch reference and the flax rebuild
    (reference: absorbing/absorbing_flows.py:14-159)."""
    import jax
    import jax.numpy as jnp

    from multimodal_particles.config_classes.absorbing_flows_config import (
        AbsorbingConfig as RefACfg,
    )
    from multimodal_particles.models.generative.absorbing.absorbing_flows import (
        AbsorbingGenerator as RefGen,
    )
    from multimodal_particles.models.generative.absorbing.states import (
        AbsorbingBridgeState as RefState,
    )

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )
    from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow,
    )
    from multimodal_particles_tpu.models.generative.absorbing.states import (
        AbsorbingBridgeState,
    )

    abs_cfg_path = os.path.join(
        test_resources_dir, "configs_files", "config-absorbing-test.yaml"
    )
    Np, Bt, C, blocks = 24, 4, 32, 1
    cfg = AbsorbingConfig.from_yaml(abs_cfg_path)
    cfg.data.batch_size = Bt
    cfg.data.max_num_particles = Np
    cfg.generator.transformer_dim = C
    cfg.generator.n_attn_blocks = blocks

    model = AbsorbingFlow(cfg)
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    params = jax.device_get(model.init(jax.random.PRNGKey(0), batch))

    torch.manual_seed(0)
    ref_cfg = RefACfg.from_yaml(abs_cfg_path)
    ref_cfg.data.batch_size = Bt
    ref_cfg.data.max_num_particles = Np
    ref_cfg.generator.transformer_dim = C
    ref_cfg.generator.n_attn_blocks = blocks
    ref_gen = RefGen(ref_cfg)
    ref_gen.eval()

    transplant_absorbing_generator(ref_gen, params["generator"], blocks)

    # ---- identical fixed inputs
    rng = np.random.default_rng(21)
    t = np.full((Bt, 1, 1), 0.43, np.float32)
    x = rng.standard_normal((Bt, Np, 3)).astype(np.float32)
    k = rng.integers(0, 8, (Bt, Np, 1))
    mask_t = (rng.random((Bt, Np, 1)) < 0.7).astype(np.int64)

    state = AbsorbingBridgeState(
        time=jnp.asarray(t),
        continuous=jnp.asarray(x),
        discrete=jnp.asarray(k),
        mask_t=jnp.asarray(mask_t, jnp.int32),
    )
    heads = model.forward(params, state, batch)

    ref_state = RefState(
        time=torch.from_numpy(t),
        continuous=torch.from_numpy(x),
        discrete=torch.from_numpy(k),
        mask_t=torch.from_numpy(mask_t),
    )
    with torch.no_grad():
        ref_heads = ref_gen(ref_state, SimpleNamespace())

    np.testing.assert_allclose(
        np.asarray(heads.continuous), ref_heads.continuous.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(heads.discrete), ref_heads.discrete.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(heads.absorbing), ref_heads.absorbing.numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_absorbing_loss_parity(ref_pkg, config_path):
    """Identical fixed bridge state + transplanted weights ⇒ identical
    per-head absorbing losses (masked MSE-vs-drift, token CE, survival
    BCE) and the 3-way MultiHeadLoss combine
    (reference: absorbing/absorbing_flows.py:209-243, losses.py:21-29)."""
    import jax
    import jax.numpy as jnp

    from multimodal_particles.config_classes.absorbing_flows_config import (
        AbsorbingConfig as RefACfg,
    )
    from multimodal_particles.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow as RefFlow,
    )
    from multimodal_particles.models.generative.absorbing.states import (
        AbsorbingBridgeState as RefState,
    )

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )
    from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow,
    )
    from multimodal_particles_tpu.models.generative.absorbing.states import (
        AbsorbingBridgeState,
    )
    from multimodal_particles_tpu.utils.losses import multihead_loss

    abs_cfg_path = os.path.join(
        test_resources_dir, "configs_files", "config-absorbing-test.yaml"
    )
    Np, Bt, C, blocks = 24, 4, 32, 1
    cfg = AbsorbingConfig.from_yaml(abs_cfg_path)
    cfg.data.batch_size = Bt
    cfg.data.max_num_particles = Np
    cfg.generator.transformer_dim = C
    cfg.generator.n_attn_blocks = blocks

    model = AbsorbingFlow(cfg)
    rng = np.random.default_rng(33)
    batch_np = JetsDataloaderModule.random_databatch(cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    params = jax.device_get(model.init(jax.random.PRNGKey(0), batch))

    torch.manual_seed(0)
    ref_cfg = RefACfg.from_yaml(abs_cfg_path)
    ref_cfg.data.batch_size = Bt
    ref_cfg.data.max_num_particles = Np
    ref_cfg.generator.transformer_dim = C
    ref_cfg.generator.n_attn_blocks = blocks
    ref_model = RefFlow(ref_cfg)
    ref_model.eval()

    transplant_absorbing_generator(
        ref_model.generator, params["generator"], blocks
    )
    params["loss_weights"] = (
        ref_model.loss_multihead.weights.detach().numpy().copy()
    )

    # fixed bridge state (same arrays both sides)
    t = np.random.default_rng(5).uniform(0.1, 0.9, (Bt, 1, 1)).astype(np.float32)
    x = rng.standard_normal((Bt, Np, 3)).astype(np.float32)
    k = rng.integers(0, 8, (Bt, Np, 1))
    mask_t = (rng.random((Bt, Np, 1)) < 0.7).astype(np.int64)

    state = AbsorbingBridgeState(
        time=jnp.asarray(t),
        continuous=jnp.asarray(x),
        discrete=jnp.asarray(k),
        mask_t=jnp.asarray(mask_t, jnp.int32),
    )
    heads = model.forward(params, state, batch)
    l_cont = float(model.loss_continuous(heads, state, batch))
    l_disc = float(model.loss_discrete(heads, batch))
    l_abs = float(model.loss_absorbing(heads, batch))
    combined = float(
        multihead_loss(
            jnp.asarray(params["loss_weights"]),
            [l_cont, l_disc, l_abs],
        )[0]
    )

    ref_state = RefState(
        time=torch.from_numpy(t),
        continuous=torch.from_numpy(x),
        discrete=torch.from_numpy(k),
        mask_t=torch.from_numpy(mask_t),
    )
    ref_batch = _to_torch_batch(batch_np)
    with torch.no_grad():
        ref_heads = ref_model.generator(ref_state, ref_batch)
        rl_cont = float(ref_model.loss_continuous(ref_heads, ref_state, ref_batch))
        rl_disc = float(ref_model.loss_discrete(ref_heads, ref_batch))
        rl_abs = float(ref_model.loss_absorbing(ref_heads, ref_batch))
        r_combined = float(
            ref_model.loss_multihead([
                torch.tensor(rl_cont), torch.tensor(rl_disc),
                torch.tensor(rl_abs),
            ])[0]
        )

    np.testing.assert_allclose(l_cont, rl_cont, rtol=1e-4)
    np.testing.assert_allclose(l_disc, rl_disc, rtol=1e-4)
    np.testing.assert_allclose(l_abs, rl_abs, rtol=1e-4)
    np.testing.assert_allclose(combined, r_combined, rtol=1e-4)
