"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/collective tests
run without TPU hardware; Pallas kernels run in interpret mode on CPU
(backends auto-select based on platform).
"""

import os

# Force CPU: the ambient environment points JAX at a live TPU tunnel
# (and a sitecustomize pre-imports jax, so env vars alone are too late —
# the config update below is what actually takes effect).
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
  sys.path.insert(0, str(REPO_ROOT))
