"""Tensor-parallel parameter shardings over the mesh's 'model' axis.

The reference has no model parallelism at all (its trainer is
single-process Lightning — reference: multimodal_particles/training/
experiments.py); this module is the TPU-native scaling path for backbones
wide enough that replicated params waste HBM or the per-chip matmul is
MXU-underutilized. It follows the compiler-first recipe the mesh module
documents (parallel/mesh.py): parameters get `NamedSharding` placements,
the step functions stay UNCHANGED, and XLA's SPMD partitioner derives the
collectives (all-gather on column-parallel outputs is avoided entirely by
the Megatron pairing below; the row-parallel matmul ends in one
psum per block, riding ICI).

Sharding pattern (Megatron pairing over each EPiC block's two-layer MLPs,
architectures/epic.py):

  fc_local1 / fc_global1   column-parallel  v: (in, out/M)  g, bias: (out/M,)
  fc_local2 / fc_global2   row-parallel     v: (in/M, out)  g, bias: replicated

The first layer's output activations are 'model'-sharded, feed the second
layer's row-parallel kernel shard-for-shard, and the block's residual add
happens after the psum — no resharding inside a block.

The transdimensional trunk is only ~11% EPiC FLOPs — its two gsdm
transformer stacks are ~88% (ARCHITECTURE.md cost split: EPiC 1.9 ms vs
2×7.4 ms stacks at B=4096), so the same Megatron pairing is applied to the
stacks' Dense pairs (architectures/gsdm.py):

  attn q / k / v            column-parallel  kernel: (C, c/M)  bias: (c/M,)
  attn proj_out             row-parallel     kernel: (c/M, C)  bias: repl.
  res conv1 / temb_proj     column-parallel  (the paired adds stay sharded)
  res conv2                 row-parallel

Attention's head reshape (B, N, c) → (B, N, heads, head_dim) keeps whole
heads per device when heads % M == 0 (the shipped n_heads=2 at M=2); the
inter-pair GroupNorm (ResnetBlock norm2) reduces within channel groups of
C/32, which 'model' shards don't straddle for any lane-multiple width, so
its statistics stay shard-local. Everything else (embeddings, projection
stacks, output heads, loss weights) is replicated: at the widths where TP
pays, the paired MLPs above are >90% of each family's FLOPs.

A dim is only sharded when it divides evenly by the model-axis size;
anything else falls back to replicated — so the same rules are safe for
every family's param tree (MBM / absorbing / transdimensional trunks all
instantiate the same EPiC block module).

Weight-norm note: the blocks use weight-normalized Dense layers
(kernel = g · v / ||v||_in). Column-parallel shards keep whole output
columns per device, so the in-dim norm is shard-local; row-parallel splits
the norm's reduction axis and XLA inserts the (tiny, (out,)-sized) psum
for it. Both stay bit-compatible with the replicated math up to reduction
order — asserted by tests/test_parallel/test_tensor_parallel.py.
"""

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: first layer of each Megatron pair — EPiC-block MLP
# first layers, gsdm attention QKV, gsdm resnet conv1/temb_proj
_COL_RE = re.compile(
    r"fc_(local|global)1"
    r"|\['(vec_)?attn_\d+'\]\['[qkv]'\]"
    r"|\['(vec_)?res_\d+'\]\['(conv1|temb_proj)'\]"
)
# row-parallel: second layer of the pair — EPiC MLP second layers, gsdm
# attention proj_out, gsdm resnet conv2
_ROW_RE = re.compile(
    r"fc_(local|global)2"
    r"|\['(vec_)?attn_\d+'\]\['proj_out'\]"
    r"|\['(vec_)?res_\d+'\]\['conv2'\]"
)


def _spec_for(path_str: str, leaf, model_size: int):
    """PartitionSpec for one param leaf, replicated unless it matches the
    Megatron pairing AND the sharded dim divides the model-axis size."""
    if _COL_RE.search(path_str):
        if leaf.ndim == 2 and leaf.shape[1] % model_size == 0:
            return P(None, "model")  # v: shard out-dim
        if leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
            return P("model")  # g / bias: follow the out-dim
    elif _ROW_RE.search(path_str):
        if leaf.ndim == 2 and leaf.shape[0] % model_size == 0:
            return P("model", None)  # v: shard in-dim
        # g / bias span the (replicated) out-dim
    return P()


def tp_param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpec matching `params` (pure; no placement)."""
    model_size = mesh.shape["model"]

    def spec(path, leaf):
        return _spec_for(jax.tree_util.keystr(path), leaf, model_size)

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_param_sharding(params, mesh: Mesh):
    """Pytree of NamedSharding matching `params`."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), tp_param_specs(params, mesh)
    )


def shard_params_tp(params, mesh: Mesh):
    """Place `params` on the mesh with the tensor-parallel shardings."""
    return jax.device_put(params, tp_param_sharding(params, mesh))
