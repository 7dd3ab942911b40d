from isdf_tpu.parallel.mesh import make_mesh, ray_sharding, replicated  # noqa: F401
