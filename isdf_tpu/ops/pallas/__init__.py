from isdf_tpu.ops.pallas.bounds_pc import closest_surface_ix  # noqa: F401
