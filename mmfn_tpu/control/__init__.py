from mmfn_tpu.control.pid import PIDController, WaypointController  # noqa: F401
from mmfn_tpu.control.planner import RoutePlanner, gps_to_location  # noqa: F401
