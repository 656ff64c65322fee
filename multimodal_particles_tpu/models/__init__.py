from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
    MultiModalEPiC,
)
from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
    AbsorbingFlow,
    AbsorbingGenerator,
)
from multimodal_particles_tpu.models.generative.transdimensional import (
    TransdimensionalJumpDiffusion,
)
from multimodal_particles_tpu.models.generative.states import (
    AbsorbingBridgeState,
    HybridState,
    MultiHeadOutput,
    OutputHeads,
)
