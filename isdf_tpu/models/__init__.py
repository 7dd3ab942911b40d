from isdf_tpu.models.sdf_mlp import (  # noqa: F401
    SDFModel,
    init_params,
    apply,
    apply_with_noise,
    sdf_and_grad,
    param_count,
)
