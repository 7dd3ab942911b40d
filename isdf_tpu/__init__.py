"""isdf_tpu — a TPU-native continual neural-SDF framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/iSDF (RSS 2022): real-time reconstruction of the signed
distance field of a scene by online training of a small MLP from a stream
of posed depth images.

Design principles (TPU-first, not a port):
  * every op in the hot loop is a pure, shape-static function fused into a
    single jitted train step (donated buffers, threefry PRNG);
  * the keyframe replay buffer is a fixed-capacity device-resident arena so
    the whole multi-step optimisation bundle runs on device via lax.scan —
    including loss-weighted keyframe selection (Gumbel top-k);
  * dynamic-shape constructs of the reference (valid-depth filtering,
    growing buffers) become masks over static shapes;
  * SDF spatial gradients (eikonal / normal losses) use jax.grad of the
    apply function instead of autograd graph surgery;
  * host keeps only: frame ingestion, the simulated clock, meshing and the
    eval protocol I/O.

Reference layer map: /root/reference/isdf (see SURVEY.md).
"""

__version__ = "0.1.0"

from isdf_tpu.utils.config import Config, load_config  # noqa: F401
