"""Driver-style invocation of dryrun_multichip(8) (not shipped to driver)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
t0 = time.time()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print(f"TOTAL {time.time()-t0:.0f}s", flush=True)
