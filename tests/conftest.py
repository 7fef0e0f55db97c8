"""Test configuration: force JAX onto CPU with 8 virtual devices.

All unit/integration tests run on the host platform so they are hermetic and
fast; multi-chip sharding tests use the 8 fake devices as a stand-in mesh
(the driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env may point at a TPU tunnel
# hermetic: never let HF libraries attempt network access (zero-egress env)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
