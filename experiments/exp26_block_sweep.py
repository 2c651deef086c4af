"""Round-3 experiment 26: late mode x block sweep of the sub-0.8 kernels.

The bench probe holds block seeds mostly fixed per mode; blur's +28%
came from a (mode, block) combo none of exp18/20/22 tried. Sweep the
near-seed neighborhood per kernel IN ONE PROCESS (compile-fleet
variance is +-10% across processes, ~0 within) and report any config
beating the seed by >3%.

Run ON TPU (alone): python experiments/exp26_block_sweep.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


SEEDS = {
    'erosion': ({'optimizations': {'computation-reuse': 'greedy'}},
                {'stage_mode': 'value', 'shift_mode': 'roll',
                 'transpose_lanes': 'on', 'block_rows': 256}),
    'xcorr': ({'optimizations': {'computation-reuse': 'greedy'}},
              {'block_rows': 256, 'stage_mode': 'value',
               'shift_mode': 'roll', 'transpose_lanes': 'on'}),
    'sobel2d': ({}, {'lane_shift': 'slice', 'block_rows': 256}),
    'denoise2d': ({}, {'block_rows': 128, 'stage_mode': 'value',
                       'shift_mode': 'roll'}),
    'seidel2d': ({'optimizations': {'computation-reuse': 'greedy'}},
                 {'block_rows': 256, 'stage_mode': 'value',
                  'shift_mode': 'roll'}),
    'jacobi2d': ({}, {'block_rows': 256}),
    'denoise3d': ({}, {'block_rows': 64, 'stage_mode': 'value',
                       'shift_mode': 'roll'}),
}

SHAPES = {
    'erosion': ((8192, 2048), (2048, 0)),
    'xcorr': ((8192, 2048), (2048, 0)),
    'sobel2d': ((8192, 2048), (2048, 0)),
    'denoise2d': ((8192, 2048), (2048, 0)),
    'seidel2d': ((8192, 2048), (2048, 0)),
    'jacobi2d': ((8192, 2048), (2048, 0)),
    'denoise3d': ((2048, 32, 128), (128, 32, 0)),
}

CANDS = {
    'erosion': [
        {'stage_mode': 'value', 'shift_mode': 'roll',
         'transpose_lanes': 'on', 'block_rows': 128},
        {'stage_mode': 'value', 'shift_mode': 'roll',
         'transpose_lanes': 'on', 'block_rows': 192},
    ],
    'xcorr': [
        {'block_rows': 128, 'stage_mode': 'value', 'shift_mode': 'roll',
         'transpose_lanes': 'on'},
        {'block_rows': 192, 'stage_mode': 'value', 'shift_mode': 'roll',
         'transpose_lanes': 'on'},
    ],
    'sobel2d': [
        {'stage_mode': 'value', 'shift_mode': 'roll', 'block_rows': 512},
        {'stage_mode': 'value', 'shift_mode': 'roll', 'block_rows': 256},
        {'lane_shift': 'slice', 'block_rows': 512},
    ],
    'denoise2d': [
        {'block_rows': 256, 'stage_mode': 'value', 'shift_mode': 'roll'},
        {'block_rows': 64, 'stage_mode': 'value', 'shift_mode': 'roll'},
    ],
    'seidel2d': [
        {'block_rows': 512, 'stage_mode': 'value', 'shift_mode': 'roll'},
        {'block_rows': 128, 'stage_mode': 'value', 'shift_mode': 'roll'},
    ],
    'jacobi2d': [
        {'block_rows': 256, 'stage_mode': 'value', 'shift_mode': 'roll'},
        {'block_rows': 512, 'stage_mode': 'value', 'shift_mode': 'roll'},
        {'block_rows': 512},
    ],
    'denoise3d': [
        {'block_rows': 128, 'stage_mode': 'value', 'shift_mode': 'roll'},
        {'block_rows': 32, 'stage_mode': 'value', 'shift_mode': 'roll'},
    ],
}


def measure(stencil, shape, cfg, peak):
  import jax
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes
  ex = PallasExecutor(stencil, shape, **cfg)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  jax.block_until_ready(ex.fn(*args))
  in_b, out_b = stream_bytes(stencil, shape)
  dt, _ = slope_time(ex.fn, args, chain_input_index(stencil),
                     (in_b + out_b) / (peak * 1e9))
  frac = (in_b + out_b) / dt / 1e9 / peak
  return dt, frac


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.profiling import peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  names = sys.argv[1:] or list(SEEDS)
  for name in names:
    overrides, seed_cfg = SEEDS[name]
    shape, tile = SHAPES[name]
    stencil = corpus.build(name, tile_size=tile, **overrides)
    try:
      dt0, f0 = measure(stencil, shape, seed_cfg, peak)
      log('%-10s SEED %-60s %.3f ms frac=%.3f' %
          (name, seed_cfg, dt0 * 1e3, f0))
    except Exception as e:
      log('%-10s SEED FAILED %r' % (name, e))
      continue
    for cfg in CANDS[name]:
      try:
        dt, f = measure(stencil, shape, cfg, peak)
        verdict = 'WIN' if dt < dt0 * 0.97 else ''
        log('%-10s      %-60s %.3f ms frac=%.3f %s' %
            (name, cfg, dt * 1e3, f, verdict))
      except Exception as e:
        log('%-10s      %-60s FAILED %s' %
            (name, cfg, str(e).splitlines()[0][:60]))


if __name__ == '__main__':
  main()
