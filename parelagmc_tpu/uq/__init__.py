from parelagmc_tpu.uq.managers import MCManager, MLMCManager  # noqa: F401
from parelagmc_tpu.uq.bayes import BayesianInverseProblem  # noqa: F401
from parelagmc_tpu.uq.ratio_managers import (  # noqa: F401
    BayesRatioManager,
    SLBayesRatioManager,
)
