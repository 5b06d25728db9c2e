from mmfn_tpu.harness.agents.base import AutonomousAgent, Track, VehicleControl  # noqa: F401
from mmfn_tpu.harness.agents.e2e import MMFNAgent, get_entry_point  # noqa: F401
from mmfn_tpu.harness.agents.baseline import BaselineAgent  # noqa: F401
from mmfn_tpu.harness.agents.trivial import DummyAgent, NpcAgent  # noqa: F401
from mmfn_tpu.harness.agents.remote import RemoteAgent  # noqa: F401
