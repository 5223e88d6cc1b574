from parelagmc_tpu.parallel.sharding import SampleMesh  # noqa: F401
