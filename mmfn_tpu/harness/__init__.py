"""Closed-loop evaluation harness.

The simulator-independent core of the reference's leaderboard stack
(leaderboard/leaderboard/): scoring (statistics), route handling, the sensor
mux, watchdogs, and an offline replay evaluator that exercises agents on
recorded routes without CARLA. CARLA-coupled glue (actor spawning, world
ticking) lives behind optional imports in ``mmfn_tpu.harness.carla_glue``.
"""

from mmfn_tpu.harness.events import TrafficEvent, TrafficEventType, RoadOption  # noqa: F401
from mmfn_tpu.harness.statistics import RouteRecord, StatisticsManager  # noqa: F401
from mmfn_tpu.harness.route import parse_routes_file, downsample_route, route_length  # noqa: F401
from mmfn_tpu.harness.watchdog import Watchdog  # noqa: F401
from mmfn_tpu.harness.sensor_interface import SensorInterface, SensorReceivedNoData  # noqa: F401
from mmfn_tpu.harness.fleet import FleetRunner  # noqa: F401
# registers the atom-composed scenario types into scenarios.SCENARIO_CLASSES
# (atoms imports scenarios, so the registration lives in atoms to avoid a
# circular import; loading it here makes the catalog complete for any
# mmfn_tpu.harness.* import)
from mmfn_tpu.harness import atoms  # noqa: F401,E402  (registration side effect)
