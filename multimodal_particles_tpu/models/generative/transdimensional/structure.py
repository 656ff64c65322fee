"""Structured transdimensional state for particle clouds.

The reference manages variable dimensionality with an OO container that
performs *shape surgery*: `delete_dims` rebuilds tensors, flatten/unflatten
machinery moves between tuple and flat views, and per-sample Python loops
compute dimension masks (reference:
models/generative/transdimensional/structure.py:8-250 and
data/particle_clouds/jets_dataloader.py:335-569).

The TPU-native re-design keeps ONE fixed-shape pytree

    StructuredState(continuous (B,N,Dc), discrete (B,N,V), dims (B,))

and expresses every dimension operation as mask arithmetic over static
shapes (SURVEY.md §7.1): deletions multiply by `arange(N) < dims`, the
"next deleted/added dimension" masks are one-hot rows at dims-1 / dims, and
`convert_problem_dim_to_tensor_dim` — a Python while-loop over dimension
classes in the reference (structure.py:209-222) — collapses to a broadcast.
Everything jits and scans.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class StructuredState:
    """Fixed-shape transdimensional state. `dims[b]` ∈ [0, N] is the live
    particle count of sample b; rows ≥ dims are zero padding."""

    continuous: jnp.ndarray  # (B, N, Dc)
    discrete: jnp.ndarray  # (B, N, V) noisy one-hot channels
    dims: jnp.ndarray  # (B,) int32
    context_continuous: Optional[jnp.ndarray] = None  # observed, not in lats
    context_discrete: Optional[jnp.ndarray] = None

    @property
    def B(self):
        return self.continuous.shape[0]

    @property
    def N(self):
        return self.continuous.shape[1]

    @property
    def Dc(self):
        return self.continuous.shape[2]

    @property
    def V(self):
        return self.discrete.shape[2]

    @property
    def flat_dim(self):
        return self.N * (self.Dc + self.V)

    # ------------------------------------------------------------- flat view

    def get_flat_lats(self):
        B = self.B
        return jnp.concatenate(
            [self.continuous.reshape(B, -1), self.discrete.reshape(B, -1)], axis=1
        )

    def set_flat_lats(self, flat):
        B, N, Dc, V = self.B, self.N, self.Dc, self.V
        cont = flat[:, : N * Dc].reshape(B, N, Dc)
        disc = flat[:, N * Dc :].reshape(B, N, V)
        return self.replace(continuous=cont, discrete=disc)

    # ----------------------------------------------------------------- masks

    def particle_mask(self, dims=None):
        """(B, N) float mask of live rows."""
        dims = self.dims if dims is None else dims
        return (
            jnp.arange(self.N)[None, :] < dims[:, None]
        ).astype(self.continuous.dtype)

    def get_mask_flat(self, dims=None):
        """Flat (B, N·(Dc+V)) existence mask (reference get_mask,
        structure.py:130-162, sans the per-call print)."""
        pm = self.particle_mask(dims)
        B = self.B
        cont = jnp.broadcast_to(pm[:, :, None], (B, self.N, self.Dc)).reshape(B, -1)
        disc = jnp.broadcast_to(pm[:, :, None], (B, self.N, self.V)).reshape(B, -1)
        return jnp.concatenate([cont, disc], axis=1)

    def get_next_dim_deleted_mask(self):
        """1s on the rows removed by moving down one dimension class
        (= row dims-1)."""
        return self.get_mask_flat(self.dims) - self.get_mask_flat(self.dims - 1)

    def get_next_dim_added_mask(self):
        """1s on the rows added by moving up one dimension class (= row dims;
        zero when dims == N)."""
        return self.get_mask_flat(jnp.clip(self.dims + 1, None, self.N)) - self.get_mask_flat(self.dims)

    # ------------------------------------------------------- dim operations

    def delete_dims(self, new_dims):
        """Mask rows ≥ new_dims (the reference rebuilds tensors —
        structure.py:86-89)."""
        pm = self.particle_mask(new_dims)[:, :, None]
        return self.replace(
            continuous=self.continuous * pm,
            discrete=self.discrete * pm,
            dims=new_dims.astype(jnp.int32),
        )

    def delete_one_dim(self):
        return self.delete_dims(self.dims - 1)

    def add_dim_where_not_max(self):
        return self.replace(
            dims=(self.dims + (self.dims < self.N)).astype(jnp.int32)
        )

    def convert_problem_dim_to_tensor_dim(self, problem_dim_data):
        """(B, N) per-dimension-class values → flat (B, N·(Dc+V)) with row r's
        features all equal to problem_dim_data[:, r]."""
        B = self.B
        cont = jnp.broadcast_to(
            problem_dim_data[:, :, None], (B, self.N, self.Dc)
        ).reshape(B, -1)
        disc = jnp.broadcast_to(
            problem_dim_data[:, :, None], (B, self.N, self.V)
        ).reshape(B, -1)
        return jnp.concatenate([cont, disc], axis=1)

    # --------------------------------------------------------- conversions

    def to_multimodal_bridge_databatch(self):
        """→ (one_hot, tokens, continuous, ctx_cont, ctx_disc, mask)
        (reference: structure.py:226-250)."""
        tokens = jnp.argmax(self.discrete, axis=-1)[..., None]
        mask = self.particle_mask()[:, :, None].astype(jnp.int32)
        return (
            self.discrete,
            tokens,
            self.continuous,
            self.context_continuous,
            self.context_discrete,
            mask,
        )


# ---------------------------------------------------------------------------
# jets graphical structure (CoM adjustment, creation targets, nearest atom)
# ---------------------------------------------------------------------------


def adjust_state(state: StructuredState):
    """NaN-scrub + center-of-mass subtraction of the continuous features over
    live rows (reference: jets_dataloader.py:426-478). Returns
    (new_state, mean (B,1,Dc))."""
    cont = jnp.nan_to_num(state.continuous)
    disc = jnp.nan_to_num(state.discrete)

    node_mask = state.particle_mask()[:, :, None]  # (B, N, 1)
    # dims == 0 safety: treat all rows as live (reference :448)
    all_live = jnp.ones_like(node_mask)
    node_mask = jnp.where((state.dims == 0)[:, None, None], all_live, node_mask)

    n = jnp.sum(node_mask, axis=1, keepdims=True)  # (B, 1, 1)
    mean = jnp.sum(cont, axis=1, keepdims=True) / jnp.maximum(n, 1.0)  # (B,1,Dc)
    cont = cont - mean * node_mask
    return state.replace(continuous=cont, discrete=disc), mean


def get_auto_target(state: StructuredState, adjust_val):
    """Ground-truth creation vector: the full state shifted by the deleted
    batch's CoM, flattened (reference: jets_dataloader.py:480-531)."""
    node_mask = state.particle_mask()[:, :, None]
    cont_from_y = (state.continuous - adjust_val) * node_mask
    B = state.B
    return jnp.concatenate(
        [cont_from_y.reshape(B, -1), state.discrete.reshape(B, -1)], axis=1
    )


def get_nearest_atom(state: StructuredState, delxt_state: StructuredState):
    """Index of the surviving particle closest to the deleted one
    (reference: jets_dataloader.py:533-569)."""
    B = state.B
    batch_idx = jnp.arange(B)
    missing_pos = state.continuous[
        batch_idx, jnp.clip(state.dims - 1, 0, None), :
    ]  # (B, Dc)
    d2 = jnp.sum(
        (delxt_state.continuous - missing_pos[:, None, :]) ** 2, axis=2
    )  # (B, N)
    atom_mask = delxt_state.particle_mask()
    d2 = atom_mask * d2 + (1.0 - atom_mask) * 1e3
    return jnp.argmin(d2, axis=1)


# ---------------------------------------------------------------------------
# multiplicity prior
# ---------------------------------------------------------------------------


class DistributionNodes:
    """Categorical prior over particle multiplicities built from an empirical
    histogram (the one live import from the reference's vendored EGNN stack —
    egnn_utils.py:1049-1086)."""

    def __init__(self, histogram: dict):
        self.n_nodes = np.array(sorted(histogram.keys()), dtype=np.int32)
        probs = np.array(
            [histogram[int(n)] for n in self.n_nodes], dtype=np.float64
        )
        self.probs = probs / probs.sum()
        self.log_probs = np.log(self.probs + 1e-30)

    def sample(self, key, n_samples=1):
        idx = jax.random.categorical(
            key, jnp.asarray(self.log_probs), shape=(n_samples,)
        )
        return jnp.asarray(self.n_nodes)[idx]

    def log_prob(self, batch_n_nodes):
        batch_n_nodes = jnp.asarray(batch_n_nodes)
        # map each value to its histogram slot (exact match expected)
        idx = jnp.searchsorted(jnp.asarray(self.n_nodes), batch_n_nodes)
        idx = jnp.clip(idx, 0, len(self.n_nodes) - 1)
        return jnp.asarray(self.log_probs)[idx]


class JetsGraphicalStructure:
    """Shape/metadata holder for the jets transdimensional problem
    (reference: jets_dataloader.py:335-378). The heavy operations
    (adjust/auto-target/nearest-atom) are the module-level pure functions
    above; this class carries static metadata + the multiplicity prior."""

    def __init__(self, datamodule):
        config = datamodule.config
        histogram = datamodule.histogram_target

        self.names_in_batch = datamodule.names_in_batch
        self.max_num_particles = config.data.max_num_particles
        self.max_problem_dim = config.data.max_num_particles
        self.num_jets = config.data.num_jets
        self.name_to_index = datamodule.name_to_index

        self.dim_features_continuous = config.data.dim_features_continuous
        self.dim_features_discrete = config.data.dim_features_discrete
        self.dim_context_continuous = config.data.dim_context_continuous
        self.dim_context_discrete = config.data.dim_context_discrete
        self.vocab_size_features = config.data.vocab_size_features
        self.vocab_size_context = config.data.vocab_size_context

        self.with_onehot_shapes = datamodule.with_onehot_shapes
        self.without_onehot_shapes = datamodule.without_onehot_shapes

        self.nodes_dist = DistributionNodes(histogram)

    def shapes_with_onehot(self):
        return self.with_onehot_shapes

    def shapes_without_onehot(self):
        return self.without_onehot_shapes

    # pure-function adapters (API parity with the reference gs object)
    @staticmethod
    def adjust_st_batch(state):
        return adjust_state(state)

    @staticmethod
    def get_auto_target(state, adjust_val):
        return get_auto_target(state, adjust_val)

    @staticmethod
    def get_nearest_atom(state, delxt_state):
        return get_nearest_atom(state, delxt_state)


class Structure:
    """Tensor-observedness metadata (API parity with the reference
    Structure, structure.py:252-383 — in the rebuild the heavy flatten/mask
    machinery lives on `StructuredState`; this class carries the static
    exist/observed/latent bookkeeping the model constructors consume)."""

    def __init__(self, exist, observed, dataset):
        self.exist = np.array(exist, dtype=np.uint8)
        self.observed = np.array(
            [o for o, e in zip(observed, self.exist) if e], dtype=np.uint8
        )
        self.latent = 1 - self.observed
        is_onehot = getattr(dataset, "is_onehot", [0] * len(self.exist))
        self.is_onehot = [oh for oh, e in zip(is_onehot, self.exist) if e]
        names = getattr(
            dataset, "names_in_batch", [f"tensor_{i}" for i in range(len(self.exist))]
        )
        self.names = [n for n, e in zip(names, self.exist) if e]
        if hasattr(dataset, "graphical_structure"):
            self.graphical_structure = dataset.graphical_structure

    @property
    def latent_names(self):
        return [n for n, l in zip(self.names, self.latent) if l]


class StructuredArgument:
    """Per-tensor scalars broadcast to the flat latent layout (reference:
    structure.py:385-407)."""

    def __init__(self, arg, state_template: StructuredState, observed=None):
        if isinstance(arg, (int, float)):
            arg = (arg, arg)
        if len(arg) == 1:
            arg = tuple(arg) * 2
        self.tensorwise_arg = tuple(arg)
        self.template = state_template

    @property
    def lats(self):
        t = self.template
        cont = jnp.full((1, t.N * t.Dc), self.tensorwise_arg[0], jnp.float32)
        disc = jnp.full((1, t.N * t.V), self.tensorwise_arg[1], jnp.float32)
        return jnp.concatenate([cont, disc], axis=1)


def state_from_list_batch(batch, vocab_size=None):
    """Build a StructuredState from the 'list' return-mode databatch
    [n_particles, target_continuous, target_discrete_onehot, (contexts...)]
    (reference dataset mode: jets_dataloader.py:102-121)."""
    n_particles = jnp.asarray(batch[0]).astype(jnp.int32)
    continuous = jnp.asarray(batch[1], dtype=jnp.float32)
    discrete = jnp.asarray(batch[2], dtype=jnp.float32)
    ctx_cont = jnp.asarray(batch[3]) if len(batch) > 3 else None
    ctx_disc = jnp.asarray(batch[4]) if len(batch) > 4 else None
    return StructuredState(
        continuous=continuous,
        discrete=discrete,
        dims=n_particles,
        context_continuous=ctx_cont,
        context_discrete=ctx_disc,
    )
