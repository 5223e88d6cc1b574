from parelagmc_tpu.utils.timing import TimeManager  # noqa: F401
from parelagmc_tpu.utils.regression import exp_weighted_regression  # noqa: F401
from parelagmc_tpu.utils.special import (  # noqa: F401
    bessi1,
    bessk1,
    matern_spde_scaling,
)
