"""mmfn_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the MMFN end-to-end
driving stack (reference: Kin-Zhang/mmfn, IROS 2022).

The framework surface mirrors the reference's capability set:

- ``mmfn_tpu.ops``      fused sensor-preprocessing kernels (image / lidar / radar / lanes)
- ``mmfn_tpu.models``   the three MMFN variants + baseline model zoo (flax/linen, NHWC)
- ``mmfn_tpu.control``  PID waypoint-following controller + route planner (host-side)
- ``mmfn_tpu.data``     dataset indexing, batching, static-shape collation
- ``mmfn_tpu.train``    training engine (AdamW, L1 waypoint loss, checkpoint/resume)
- ``mmfn_tpu.parallel`` device-mesh helpers for data-parallel training (GSPMD)
- ``mmfn_tpu.mapping``  OpenDRIVE vectorized-map tooling (.rmap) + per-pose lane crop
- ``mmfn_tpu.harness``  closed-loop evaluation harness (routes, scoring, replay)

Design notes (TPU-first, not a port):
- all image-like tensors are NHWC (TPU-preferred layout);
- every compute path is jit-compiled with static shapes — ragged structures
  (lane lists, radar returns) are padded to static maxima and masked;
- autoregressive loops (waypoint GRU) are ``lax.scan``;
- host/device boundary is explicit: PID controllers, route planners, and other
  stateful 20 Hz scalar logic stay on host, everything tensor-shaped is on device.
"""

__version__ = "0.1.0"

from mmfn_tpu.config import GlobalConfig  # noqa: F401
