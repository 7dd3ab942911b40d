from isdf_tpu.vis import slices  # noqa: F401
from isdf_tpu.vis import mesh_export  # noqa: F401
