from parelagmc_tpu.samplers.base import MLSampler  # noqa: F401
from parelagmc_tpu.samplers.pde import (  # noqa: F401
    SPDESampler,
    EmbeddedSPDESampler,
    L2ProjectionSPDESampler,
)
