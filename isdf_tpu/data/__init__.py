from isdf_tpu.data.synthetic import SyntheticScene, SyntheticDataset  # noqa: F401
from isdf_tpu.data.frame_store import FrameStore, FrameData  # noqa: F401
