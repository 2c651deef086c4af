"""Compile-time caching.

The reference's only persistent cache is the AutoBridge floorplan cache
keyed by the stencil text (cluster.py:104-160). The TPU analog is the
XLA persistent compilation cache: identical stencil + shape + flags hit
the cache and skip the 20-40 s first compile.
"""

from __future__ import annotations

import logging
import os

_logger = logging.getLogger().getChild(__name__)


def enable(cache_dir: str = '~/.cache/soda_tpu_xla') -> str:
  """Turn on JAX's persistent compilation cache (idempotent)."""
  import jax
  path = os.path.expanduser(cache_dir)
  os.makedirs(path, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', path)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  _logger.info('persistent compilation cache at %s', path)
  return path
