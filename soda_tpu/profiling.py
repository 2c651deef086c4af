"""Profiling & observability helpers.

The reference's profiling surfaces (SURVEY.md §5.1) map here as:

  * generated-host kernel timing / "pixel/ns" printouts
    (xilinx/host.py:798-827)        -> report_throughput()
  * FRT Load/Compute/Store GB/s     -> report_throughput() fields
  * post-HLS csynth reports         -> trace() producing a TensorBoard
    profile via jax.profiler (the XLA/Mosaic analog of reading the
    synthesized design's timing)
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time
from typing import Iterator, Optional, Tuple

import numpy as np

_logger = logging.getLogger().getChild(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Capture a device profile around a block (view with TensorBoard)."""
  import jax
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


@dataclasses.dataclass
class Throughput:
  seconds: float
  cells: int
  hbm_bytes: int
  iterate: int = 1

  @property
  def pixel_per_ns(self) -> float:
    return self.cells / self.seconds / 1e9

  @property
  def cells_per_s(self) -> float:
    return self.cells * self.iterate / self.seconds

  @property
  def effective_gbps(self) -> float:
    return self.hbm_bytes / self.seconds / 1e9

  def report(self, print_fn=print) -> None:
    # same surface as the generated hosts (reference host.py:816-823,
    # frt/host.py:324-335)
    print_fn('Kernel execution time: %.3f ms' % (self.seconds * 1e3))
    print_fn('Kernel throughput: %.6f pixel/ns' % self.pixel_per_ns)
    print_fn('Effective HBM bandwidth: %.1f GB/s' % self.effective_gbps)
    if self.iterate > 1:
      print_fn('Sweep rate: %.3g cells/s (%d sweeps fused)' %
               (self.cells_per_s, self.iterate))


def measure(executor, inputs, params=None, reps: int = 3) -> Throughput:
  """Wall-clock measurement of an executor (device-resident args).

  NOTE: on remote-attached devices prefer the chained-loop slope method
  (see bench.py) — per-call host timing can under-report.
  """
  import jax
  stencil = executor.stencil
  args = executor.prepare(inputs, params)
  jax.block_until_ready(executor.fn(*args))  # warm-up (discarded)
  t0 = time.perf_counter()
  for _ in range(reps):
    outs = executor.fn(*args)
  jax.block_until_ready(outs)
  seconds = (time.perf_counter() - t0) / reps
  cells = int(np.prod(executor.shape))
  hbm = sum(cells * stencil.symbol_table[n].width_in_bytes
            for n in stencil.input_names + stencil.output_names)
  return Throughput(seconds=seconds, cells=cells, hbm_bytes=hbm,
                    iterate=stencil.iterate)
