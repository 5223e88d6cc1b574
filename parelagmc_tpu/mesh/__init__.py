from parelagmc_tpu.mesh.structured import StructuredMesh  # noqa: F401
from parelagmc_tpu.mesh.factories import (  # noqa: F401
    make_box_mesh,
    make_embedded_box_mesh,
    make_spe10_mesh,
    make_egg_mesh,
)
