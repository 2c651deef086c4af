"""Shared utilities (errors, toposort, index serialization).

Covers the slices of ``haoda.util`` and ``soda.util`` the rebuild needs
(SURVEY.md §2.4, §2.9 "Util").
"""

from __future__ import annotations

import functools
import operator
import sys
from typing import Dict, Iterable, List, Sequence, Set, Tuple, TypeVar

COORDS_TILED = 'xyzw'
COORDS_IN_TILE = 'ijkl'
COORDS_IN_ORIG = 'pqrs'
MAX_DRAM_BANK = 4


class SemanticError(Exception):
  """User-visible error in the stencil program."""


class SemanticWarn(Exception):
  pass


class InternalError(Exception):
  """Invariant violation inside the compiler."""


class InputError(Exception):
  """Invalid input configuration."""


def serialize(vec: Sequence[int], tile_size: Sequence[int]) -> int:
  """N-D index -> column-major linear offset (reference soda/util.py:9).

  Dimension 0 has stride 1; the last tile_size entry (the streaming
  dimension sentinel) is never used as a stride bound.
  """
  return sum((vec[i] * functools.reduce(operator.mul, tile_size[:i])
              for i in range(1, len(tile_size))), vec[0])


def serialize_iter(iterable, tile_size) -> List[int]:
  return [serialize(x, tile_size) for x in iterable]


def deserialize(offset: int, tile_size: Sequence[int]) -> Tuple[int, ...]:
  """Inverse of serialize (reference soda/util.py:17)."""

  def gen(offset):
    for size in tile_size[:-1]:
      yield offset % size
      offset = offset // size
    yield offset

  return tuple(gen(offset))


_T = TypeVar('_T')


def toposort_flatten(graph: Dict[_T, Set[_T]], sort: bool = True) -> List[_T]:
  """Topological sort of {node: set(dependencies)} -> dependency-first list.

  Drop-in for the external ``toposort.toposort_flatten`` the reference
  depends on (core.py:468). Deterministic: ties broken by sorted order
  when ``sort`` else insertion order.
  """
  graph = {k: set(v) for k, v in graph.items()}
  # make sure every referenced node exists
  extra = {dep for deps in graph.values() for dep in deps} - set(graph)
  order_hint = {k: i for i, k in enumerate(list(graph) + sorted(
      extra, key=repr))}
  for dep in extra:
    graph[dep] = set()
  result: List[_T] = []
  emitted: Set[_T] = set()
  while graph:
    ready = [k for k, deps in graph.items() if deps <= emitted]
    if not ready:
      raise ValueError('cyclic dependency detected among: %s' %
                       sorted(map(repr, graph)))
    if sort:
      try:
        ready.sort()
      except TypeError:
        ready.sort(key=order_hint.get)
    else:
      ready.sort(key=order_hint.get)
    for k in ready:
      result.append(k)
      emitted.add(k)
      del graph[k]
  return result


def idx2str(idx) -> str:
  return '(%s)' % ', '.join(map(str, idx))


def lst2str(lst) -> str:
  return '[%s]' % ', '.join(map(str, lst))


# -- correctness thresholds (reference frt/host.py:633-657 squared form) -------
# default relaxed to 1e-4 for XLA/Mosaic FMA contraction vs the
# individually-rounded oracle; contrast's +-100-coefficient cancelling
# sums legitimately differ by one FMA-contracted ulp of a ~5e3-magnitude
# running sum (see tests/checks.py for the full rationale)
DEFAULT_THRESHOLD = 1e-4
KERNEL_THRESHOLDS = {'contrast': 1e-3}


def threshold_for(app_name: str) -> float:
  """Per-kernel float comparison threshold (squared-form criterion)."""
  for key, value in KERNEL_THRESHOLDS.items():
    if app_name.startswith(key):
      return value
  return DEFAULT_THRESHOLD


def probe_devices(timeout_s: float):
  """``jax.devices()`` on a bounded daemon thread, or None on timeout.

  The call HANGS (never raises) when the TPU tunnel is down, so every
  host-side consumer (bench, CLI --estimate/--tune) must bound it. The
  thread is abandoned on timeout; the JAX runtime caches the backend,
  so a late success still serves any subsequent probe in-process.
  """
  import threading
  box: list = []

  def probe():
    try:
      import jax
      box.append(jax.devices())
    except Exception:  # noqa: BLE001 - no device is a normal outcome
      pass

  t = threading.Thread(target=probe, daemon=True)
  t.start()
  t.join(timeout_s)
  return box[0] if box else None


def device_reachable(timeout_s: float) -> bool:
  """Bounded device check in a SUBPROCESS — safe to call before this
  process touches any jax backend.

  The in-thread ``probe_devices`` poisons the process on timeout: the
  abandoned thread keeps holding jax's backend-init lock inside the
  hung tunnel handshake, so every later backend lookup (even for CPU)
  blocks forever. Probing in a child process keeps the parent's
  backend state untouched, so a CPU fallback still works after a
  timeout. Costs a child-interpreter jax import (~2-4 s) on success.
  """
  import subprocess
  try:
    proc = subprocess.run(
        [sys.executable, '-c', 'import jax; jax.devices()'],
        timeout=timeout_s, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    return proc.returncode == 0
  except (subprocess.TimeoutExpired, OSError):
    return False
