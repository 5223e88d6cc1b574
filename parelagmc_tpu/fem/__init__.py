from parelagmc_tpu.fem.assembly import MixedLevel, build_mixed_level, pack_ell  # noqa: F401
from parelagmc_tpu.fem.hierarchy import GeometricHierarchy, build_geometric_hierarchy  # noqa: F401
