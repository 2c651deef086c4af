"""Round-2 experiment 4: erosion decomposition + shift-cost calibration.

erosion (i16 2x19-tap min) runs at 0.24 of HBM roofline; the greedy CR
schedule is compact (14 mins) so the loss must be in per-shift cost.
Measures:

  1. synthetic shift-cost kernels: an 8-stage min chain along the
     stream (sublane) axis with aligned (8) vs misaligned (1) distances,
     and along the lane axis — per-shift cost in roofline terms;
  2. erosion variants: lane_shift rotate vs slice, hand-written
     aligned-distance doubling tree vs greedy CR, block 512.

Run ON TPU: python experiments/exp4_erosion.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def bench_text(tag, src, shape, peak, ex_opts=None, block_rows=None):
  import jax
  from bench import chain_input_index, slope_time, stream_bytes
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor

  stencil = api.build_stencil(src)
  ex = PallasExecutor(stencil, shape, block_rows=block_rows,
                      **(ex_opts or {}))
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  in_b, out_b = stream_bytes(stencil, shape)
  dt, _ = slope_time(ex.fn, args, chain_input_index(stencil),
                     (in_b + out_b) / (peak * 1e9))
  frac = (in_b + out_b) / dt / 1e9 / peak
  log('%-28s block=%-4d %.3f ms  roofline=%.3f' %
      (tag, ex.block_rows, dt * 1e3, frac))
  return frac


def min_chain_dsl(n_stages, axis, dist, lanes):
  """n_stages chained 2-op min stages shifted along one axis."""
  # axis 0 = DSL dim 0 = lanes; axis 1 = DSL dim 1 = streaming rows
  def idx(d):
    return '(%d, 0)' % d if axis == 0 else '(0, %d)' % d

  lines = ['kernel: chain', 'burst width: 64', 'unroll factor: 1',
           'iterate: 1', 'border: ignore', 'cluster: none',
           'input dram 0 int16: x(%d, *)' % lanes]
  prev = 'x'
  for i in range(n_stages):
    cur = 'c%d' % i
    kind = 'local' if i + 1 < n_stages else 'output dram 1'
    if i + 1 == n_stages:
      cur = 'y'
    lines.append('%s int16: %s(0, 0) = min(%s%s, %s%s)' %
                 (kind, cur, prev, idx(0), prev, idx(dist)))
    prev = cur
  return '\n'.join(lines)


# erosion with a hand-scheduled doubling tree whose stream-axis
# distances are 8-aligned where the window algebra allows
EROSION_ALIGNED = """
kernel: erosion
burst width: 64
unroll factor: 4
iterate: 1
border: ignore
cluster: none
input dram 0 int16: input(2048, *)
local int16: s2(0, 0) = min(input(0, 0), input(0, 1))
local int16: s4(0, 0) = min(s2(0, 0), s2(0, 2))
local int16: s8(0, 0) = min(s4(0, 0), s4(0, 4))
local int16: s16(0, 0) = min(s8(0, 0), s8(0, 8))
local int16: tmp(0, 9) = min(min(s16(0, 0), s2(0, 16)), input(0, 18))
local int16: l2(0, 0) = min(tmp(0, 0), tmp(1, 0))
local int16: l4(0, 0) = min(l2(0, 0), l2(2, 0))
local int16: l8(0, 0) = min(l4(0, 0), l4(4, 0))
local int16: l16(0, 0) = min(l8(0, 0), l8(8, 0))
output dram 1 int16: output(9, 0) = min(min(l16(0, 0), l2(16, 0)),
  tmp(18, 0))
"""


def main():
  import jax
  from bench import bench_kernel, peak_bandwidth
  from soda_tpu import corpus

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (8192, 2048)

  # 1. shift-cost calibration: 8 stages, i16, one shifted load each
  for tag, axis, dist in (
      ('chain stream dist=8 (align)', 1, 8),
      ('chain stream dist=1', 1, 1),
      ('chain lane dist=8', 0, 8),
      ('chain lane dist=1', 0, 1),
  ):
    try:
      bench_text(tag, min_chain_dsl(8, axis, dist, 2048), shape, peak)
    except Exception as e:  # noqa: BLE001
      log('%s FAILED: %s' % (tag, str(e).splitlines()[0][:140]))

  # 2. erosion variants
  greedy = {'tile_size': (2048, 0),
            'optimizations': {'computation-reuse': 'greedy'}}
  try:
    frac, *_ = bench_kernel('erosion', shape, greedy, peak,
                            ex_opts={'stage_mode': 'value'},
                            compare_xla=False)
    log('>>> erosion greedy slice   %.3f' % frac)
  except Exception as e:  # noqa: BLE001
    log('erosion greedy FAILED: %r' % (e,))
  try:
    frac, *_ = bench_kernel('erosion', shape, greedy, peak,
                            ex_opts={'stage_mode': 'value',
                                     'lane_shift': 'rotate'},
                            compare_xla=False)
    log('>>> erosion greedy rotate  %.3f' % frac)
  except Exception as e:  # noqa: BLE001
    log('erosion greedy rotate FAILED: %r' % (e,))
  for blk in (None, 512):
    try:
      frac = bench_text('erosion aligned tree', EROSION_ALIGNED, shape,
                        peak, ex_opts={'stage_mode': 'value'},
                        block_rows=blk)
    except Exception as e:  # noqa: BLE001
      log('erosion aligned FAILED: %s' % (str(e).splitlines()[0][:140],))
  try:
    frac = bench_text('erosion aligned rotate', EROSION_ALIGNED, shape,
                      peak, ex_opts={'stage_mode': 'value',
                                     'lane_shift': 'rotate'})
  except Exception as e:  # noqa: BLE001
    log('erosion aligned rot FAILED: %s' % (str(e).splitlines()[0][:140],))


if __name__ == '__main__':
  main()
