#!/usr/bin/env python
"""External driving-stack entry for the process bridge (the reference
RosAgent's $TEAM_CODE_ROOT/start.sh analog, ros_agent.py:80-96).

Launched by RemoteAgent with MMFN_BRIDGE_SOCKET set; dials the agent's
socket and answers every sensor tick with a control from the NavStack
route follower. Run an evaluation against it with:

    python run_steps/phase0_run_eval.py --config run_steps/config/eval.yaml \
        agent.type=remote "agent.stack_cmd=python examples/remote_stack.py"
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmfn_tpu.harness.agents.remote import NavStack, serve_stack  # noqa: E402

if __name__ == "__main__":
    serve_stack(NavStack())
