from parelagmc_tpu.parallel.sharding import SampleMesh  # noqa: F401
from parelagmc_tpu.parallel.spatial import (  # noqa: F401
    SpatialSolver,
    slab_partition,
)
