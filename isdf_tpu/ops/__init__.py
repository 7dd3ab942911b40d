from isdf_tpu.ops import geometry  # noqa: F401
from isdf_tpu.ops import embedding  # noqa: F401
from isdf_tpu.ops import sampling  # noqa: F401
from isdf_tpu.ops import bounds  # noqa: F401
from isdf_tpu.ops import losses  # noqa: F401
from isdf_tpu.ops import render  # noqa: F401
from isdf_tpu.ops import frustum  # noqa: F401
