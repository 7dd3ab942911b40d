from isdf_tpu.engine.buffer import FrameBuffer, make_buffer, add_frame  # noqa: F401
from isdf_tpu.engine.step import StepFunctions, build_step_functions  # noqa: F401
