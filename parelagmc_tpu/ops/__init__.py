from parelagmc_tpu.ops.ell import ELL, CoefELL, ell_apply, coef_ell_apply, pack_csr_to_ell  # noqa: F401
from parelagmc_tpu.ops.solvers import pcg, minres  # noqa: F401
from parelagmc_tpu.ops.multigrid import MGHierarchy, build_mg_hierarchy, v_cycle  # noqa: F401
