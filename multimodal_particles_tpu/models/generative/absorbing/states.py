"""Absorbing-flow state containers — aliases to the shared pytree states
(the reference keeps a duplicate dataclass module here:
models/generative/absorbing/states.py:8-72; its `cat` maps mask_t from a
nonexistent "absorbing" attribute, a bug not replicated)."""

from multimodal_particles_tpu.models.generative.states import (  # noqa: F401
    AbsorbingBridgeState,
    OutputHeads,
)
