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
from typing import Iterator, Tuple

import numpy as np

from soda_tpu import utils

_logger = logging.getLogger().getChild(__name__)


def peak_bandwidth(device) -> float:
  """Peak HBM bandwidth of a device in GB/s (by device_kind substring;
  conservative default for unknown parts)."""
  peaks = (('v5 lite', 819.0), ('v5e', 819.0), ('v5p', 2765.0),
           ('v4', 1228.0), ('v6 lite', 1640.0), ('v6e', 1640.0),
           ('v3', 900.0), ('v2', 700.0))
  kind = getattr(device, 'device_kind', '').lower()
  for sub, bw in peaks:
    if sub in kind:
      return bw
  return 819.0


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
  """Throughput measurement of an executor (device-resident args).

  Uses the chained-loop SLOPE method: per-call host timing
  under-reports on remote-attached devices (dispatch acks can arrive
  before device completion), so a naive clock here would contradict
  the project's own bench methodology.
  """
  import jax
  stencil = executor.stencil
  args = list(executor.prepare(inputs, params))
  in_b, out_b = stream_bytes(stencil, executor.shape)
  try:
    peak = peak_bandwidth(jax.devices()[0])
    seconds, _ = slope_time(executor.fn, args,
                            chain_input_index(stencil),
                            (in_b + out_b) / (peak * 1e9), reps=reps)
  except (utils.InputError, ValueError, TypeError):
    # unchainable signature (outputs do not feed back as inputs):
    # fall back to wall clock, which may under-report over tunnels
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


# -- remote-attachment-safe timing (the bench's method) ------------------------

N_SMALL = 5


def chain_input_index(stencil) -> int:
  """Index of the input that can carry a timing chain: same dtype as
  the first output, or same item size (chained via bitcast)."""
  out0 = stencil.output_names[0]
  out_dt = stencil.symbol_table[out0].np_dtype
  for idx, in_name in enumerate(stencil.input_names):
    if stencil.symbol_table[in_name].np_dtype == out_dt:
      return idx
  for idx, in_name in enumerate(stencil.input_names):
    if (np.dtype(stencil.symbol_table[in_name].np_dtype).itemsize ==
        np.dtype(out_dt).itemsize):
      return idx
  raise RuntimeError('no chainable input for %s' % stencil.app_name)


def stream_bytes(stencil, shape) -> Tuple[float, float]:
  """Unique HBM traffic of one pass (inputs read once, outputs written
  once)."""
  cells = float(np.prod(shape))
  in_b = sum(cells * stencil.symbol_table[n].width_in_bytes
             for n in stencil.input_names)
  out_b = sum(cells * stencil.symbol_table[n].width_in_bytes
              for n in stencil.output_names)
  return in_b, out_b


def slope_time(fn, args, chain_idx, est_iter_s, reps=3):
  """Per-iteration time of ``fn(*args)`` via the chained-loop slope.

  Remote-tunnel TPU attachments make per-call host timing unreliable
  (dispatch acks can arrive before device completion), so this times
  ``lax.fori_loop`` chains of N_SMALL and N_BIG data-dependent
  applications — each iteration feeds the previous output back in, so
  nothing can be elided or overlapped — forces completion with a
  data-dependent scalar fetch, and takes the slope. Constant dispatch
  and fetch overhead cancels. Returns (dt_seconds, compile_seconds).
  """
  import jax
  import jax.numpy as jnp
  from jax import lax

  in_dtype = args[chain_idx].dtype

  def body(i, a):
    call_args = list(args)
    call_args[chain_idx] = a
    out = fn(*call_args)[0]
    if out.dtype != in_dtype:  # same-width chain (e.g. u16 -> i16)
      out = jax.lax.bitcast_convert_type(out, in_dtype)
    return out

  def make(n):
    return jax.jit(lambda a0: lax.fori_loop(0, n, body, a0))

  # adaptive loop length: the iteration-count delta must represent
  # >= ~40 ms of device time so dispatch/fetch jitter cancels cleanly
  n_big = N_SMALL + max(20, int(0.04 / est_iter_s))
  f_small, f_big = make(N_SMALL), make(n_big)
  x0 = args[chain_idx]

  def timed(f):
    t0 = time.perf_counter()
    out = f(x0)
    _ = jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)).item()
    return time.perf_counter() - t0

  t0 = time.perf_counter()
  timed(f_small)
  timed(f_big)  # warm-up / compile
  compile_s = time.perf_counter() - t0
  t_small = min(timed(f_small) for _ in range(reps))
  t_big = min(timed(f_big) for _ in range(reps))
  dt = max((t_big - t_small) / (n_big - N_SMALL), 1e-9)
  return dt, compile_s
