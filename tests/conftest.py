"""Test configuration: force JAX onto CPU with 8 virtual devices.

All unit/integration tests run on the host platform so they are hermetic and
fast; multi-chip sharding tests use the 8 fake devices as a stand-in mesh
(the driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).

NOTE: a sitecustomize on PYTHONPATH pins JAX_PLATFORMS to the remote-TPU
plugin at interpreter start, so env vars are not enough — we must override
through jax.config before any backend is initialized.
"""

import os
import sys

# hermetic: never let HF libraries attempt network access (zero-egress env)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
