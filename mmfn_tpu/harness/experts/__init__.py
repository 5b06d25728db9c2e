from mmfn_tpu.harness.experts.world_view import Actor, EgoState, WorldView  # noqa: F401
from mmfn_tpu.harness.experts.pilot import ExpertPilot  # noqa: F401
