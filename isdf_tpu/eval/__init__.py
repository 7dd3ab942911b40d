from isdf_tpu.eval import metrics  # noqa: F401
from isdf_tpu.eval import protocol  # noqa: F401
