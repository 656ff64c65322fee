from multimodal_particles_tpu.config_classes.multimodal_bridge_matching_config import (
    MultimodalBridgeMatchingConfig,
)
from multimodal_particles_tpu.config_classes.absorbing_flows_config import (
    AbsorbingConfig,
)
