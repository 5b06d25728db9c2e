"""Model zoo: the three MMFN variants plus the benchmark baselines.

All modules are flax/linen, NHWC, static-shape, and structured so a torch
checkpoint from the reference converts mechanically (see
``mmfn_tpu.utils.weights``).
"""

from mmfn_tpu.models.mmfn import MMFN, build_model  # noqa: F401
from mmfn_tpu.models.registry import get_entry_point, MODEL_REGISTRY  # noqa: F401
