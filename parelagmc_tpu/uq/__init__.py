from parelagmc_tpu.uq.managers import MCManager, MLMCManager  # noqa: F401
