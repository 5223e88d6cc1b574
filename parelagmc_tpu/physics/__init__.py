from parelagmc_tpu.physics.darcy import DarcySolver  # noqa: F401
