"""Round-4 experiment 33: large-block re-sweep after the Mosaic fleet
update.

Round 3 pinned hybrid/roll blocks at <=256 because larger blocks
crashed Mosaic; the 2026-08-19 bench run showed erosion's hybrid
COMPILING at block 512 (and winning: 0.460 -> 0.498). Re-sweep every
sub-0.8 kernel at 2x/4x its current tuned block, plus mode
cross-combos the bench probe budget never reaches, IN ONE PROCESS
(compile-fleet variance is +-10% across processes, ~0 within).

Wins > 3% are written into the autotune cache (the exact tkey the
bench reads), so the driver bench inherits them without code changes.

Run ON TPU (alone): python experiments/exp33_big_blocks.py [names...]
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


ROLL = {'stage_mode': 'value', 'shift_mode': 'roll'}
HYB = dict(ROLL, transpose_lanes='on')

# per-kernel candidates beyond the bench probe's reach (the probe only
# doubles blocks off the winner and tries mode flips one at a time)
CANDS = {
    'erosion': [
        dict(HYB, block_rows=1024, lane_shift='rotate'),
        dict(HYB, block_rows=512, lane_shift='rotate',
             stream_loop='peel'),
        dict(HYB, block_rows=512),
        dict(HYB, block_rows=1024),
    ],
    'xcorr': [
        dict(HYB, block_rows=512, lane_shift='rotate'),
        dict(HYB, block_rows=1024, lane_shift='rotate'),
        dict(HYB, block_rows=512),
        dict(HYB, block_rows=256, lane_shift='rotate',
             stream_loop='peel'),
    ],
    'seidel2d': [
        dict(ROLL, block_rows=512),
        dict(ROLL, block_rows=1024),
        dict(ROLL, block_rows=256, lane_shift='rotate'),
        dict(ROLL, block_rows=512, lane_shift='rotate'),
        dict(ROLL, block_rows=256, transpose_lanes='on'),
    ],
    'jacobi2d': [
        {'block_rows': 512},
        {'block_rows': 1024},
        dict(ROLL, block_rows=256),
        dict(ROLL, block_rows=512),
        {'block_rows': 256, 'lane_shift': 'rotate'},
        dict(ROLL, block_rows=256, lane_shift='rotate'),
    ],
    'denoise2d': [
        dict(ROLL, block_rows=256),
        dict(ROLL, block_rows=512),
        dict(ROLL, block_rows=128, lane_shift='rotate'),
        dict(ROLL, block_rows=128, transpose_lanes='on'),
    ],
    'denoise3d': [
        dict(ROLL, block_rows=128),
        dict(ROLL, block_rows=256),
        dict(ROLL, block_rows=64, stream_loop='peel'),
    ],
    'sobel2d': [
        {'lane_shift': 'slice', 'block_rows': 512},
        {'lane_shift': 'slice', 'block_rows': 1024},
        dict(ROLL, block_rows=512),
        dict(ROLL, block_rows=512, lane_shift='rotate'),
    ],
    'blur': [
        {'block_rows': 1024},
        dict(ROLL, block_rows=1024),
        {'block_rows': 512, 'lane_shift': 'rotate'},
    ],
    'heat3d': [
        dict(ROLL, block_rows=256),
        dict(ROLL, block_rows=512),
    ],
    'jacobi3d': [
        dict(ROLL, block_rows=256),
        dict(ROLL, block_rows=64),
    ],
}


def measure(stencil, shape, cfg, peak, reps=2):
  import jax
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes
  ex = PallasExecutor(stencil, shape, **cfg)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  in_b, out_b = stream_bytes(stencil, shape)
  dt, _ = slope_time(ex.fn, args, chain_input_index(stencil),
                     (in_b + out_b) / (peak * 1e9), reps=reps)
  frac = (in_b + out_b) / dt / 1e9 / peak
  return dt, frac


def main():
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.profiling import peak_bandwidth
  from soda_tpu.tools import autotune
  peak = peak_bandwidth(jax.devices()[0])
  kind = getattr(jax.devices()[0], 'device_kind', '?')
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  names = sys.argv[1:] or [n for n, _, _, _ in bench_mod.CONFIGS
                           if n in CANDS]
  tpath = os.path.expanduser(autotune.DEFAULT_CACHE)
  for name, shape, overrides, seeds in bench_mod.CONFIGS:
    if name not in names or name not in CANDS:
      continue
    stencil = corpus.build(name, **overrides)
    tkey = autotune._key(stencil, tuple(shape), kind)
    table = autotune._load(tpath)
    seed_cfg = dict(table.get(tkey, {}).get('config') or seeds[0])
    try:
      dt0, f0 = measure(stencil, shape, seed_cfg, peak)
      log('%-10s SEED %-70s %.3f ms frac=%.3f' %
          (name, seed_cfg, dt0 * 1e3, f0))
    except Exception as e:  # noqa: BLE001
      log('%-10s SEED FAILED %s' % (name, str(e).splitlines()[0][:70]))
      dt0 = float('inf')
    best_dt, best_cfg = dt0, seed_cfg
    for cfg in CANDS[name]:
      if cfg == seed_cfg:
        continue
      try:
        dt, f = measure(stencil, shape, cfg, peak)
      except Exception as e:  # noqa: BLE001
        log('%-10s      %-70s FAILED %s' %
            (name, cfg, str(e).splitlines()[0][:60]))
        continue
      verdict = 'WIN' if dt < dt0 * 0.97 else ''
      log('%-10s      %-70s %.3f ms frac=%.3f %s' %
          (name, cfg, dt * 1e3, f, verdict))
      if dt < best_dt:
        best_dt, best_cfg = dt, dict(cfg)
    if best_cfg != seed_cfg and np.isfinite(best_dt):
      table = autotune._load(tpath)
      table[tkey] = {'stencil': stencil.app_name, 'shape': list(shape),
                     'device': kind, 'config': best_cfg,
                     'ms': round(best_dt * 1e3, 4)}
      autotune._store(tpath, table)
      log('%-10s CACHED %-66s %.3f ms' % (name, best_cfg, best_dt * 1e3))


if __name__ == '__main__':
  main()
