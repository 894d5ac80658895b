"""Device-mesh parallelism (jax.sharding)."""

from .mesh import make_mesh, shard_scan_recon, device_pipeline_step  # noqa: F401
