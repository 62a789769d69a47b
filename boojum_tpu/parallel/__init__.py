"""Multi-chip parallelism (mesh sharding, collectives)."""

from .sharding import distributed_commit_step, distributed_sum_reduce, make_mesh  # noqa: F401
