"""Query the round-3 MetricsLog surfaces off a phase0-produced recording
(verify scratch): proves the new recorder fields flow through the real CLI
and every added query answers sensibly."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmfn_tpu.harness.metrics_log import MetricsLog

log = MetricsLog("/tmp/verify_rec/0_rep0.json")
n = log.get_total_frame_count()
ego = log.get_ego_vehicle_id()
f = n // 2
print("frames:", n)
print("ego physics:", log.get_vehicle_physics_control(ego, f))
print("vehicle lights mid-route:", log.get_vehicle_lights(ego, f))
print("scene light:", log.get_scene_light_state(0, f))
print("frozen:", log.is_traffic_light_frozen(0, f))
print("vel@frame:", log.get_actor_velocities_at_frame(f)[ego])
print("acc all shape:", log.get_all_actor_accelerations(ego).shape)
assert log.get_vehicle_physics_control(ego, f)["max_accel"] == 4.0
assert isinstance(log.get_vehicle_lights(ego, f), list)
assert log.get_all_actor_accelerations(ego).shape == (n, 2)
print("OK: round-3 MetricsLog surfaces answer off the phase0 recording")
