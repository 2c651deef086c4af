"""Round-4 experiment 38: retry fleet-crashed combos on the weak kernels.

exp33/34 found the >=512-block and peel/prefetch joint configs
HTTP-500ing on one compile-fleet stretch while compiling fine an hour
earlier. The fleet updates between sessions; this probe retries the
previously-crashing or never-tried JOINT combos (big block x peel,
seed x prefetch) on every kernel still under the 0.8 bar, at the bench
shapes, one process. Wins land in the autotune cache (same tkey the
bench reads) so the driver bench inherits them.

Run ON TPU (alone): python experiments/exp38_fleet_retry.py [names...]
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

CANDS = {
    'erosion': [
        dict(HYB, block_rows=512, lane_shift='rotate',
             stream_loop='peel'),
        dict(HYB, block_rows=512, lane_shift='rotate', prefetch=2),
        dict(HYB, block_rows=1024, lane_shift='rotate'),
    ],
    'xcorr': [
        dict(HYB, block_rows=320, lane_shift='rotate',
             stream_loop='peel'),
        dict(HYB, block_rows=320, lane_shift='rotate', prefetch=2),
        dict(HYB, block_rows=352, lane_shift='rotate'),
    ],
    'sobel2d': [
        {'lane_shift': 'slice', 'block_rows': 256,
         'stream_loop': 'peel'},
        {'lane_shift': 'slice', 'block_rows': 256, 'prefetch': 2},
        {'lane_shift': 'slice', 'block_rows': 640},
        dict(ROLL, block_rows=640),
    ],
    'denoise3d': [
        dict(ROLL, block_rows=64, stream_loop='peel'),
        dict(ROLL, block_rows=64, prefetch=2),
        dict(ROLL, block_rows=128),
    ],
    'jacobi2d': [
        dict(ROLL, block_rows=128, stream_loop='peel'),
        dict(ROLL, block_rows=256, stream_loop='peel'),
        {'stream_loop': 'peel', 'block_rows': 256},
    ],
    'seidel2d': [
        dict(ROLL, block_rows=160, stream_loop='peel'),
        dict(ROLL, block_rows=96, stream_loop='peel'),
        dict(ROLL, block_rows=128, stream_loop='peel', prefetch=2),
    ],
    'denoise2d': [
        dict(ROLL, block_rows=48, stream_loop='peel'),
        dict(ROLL, block_rows=80, stream_loop='peel'),
        dict(ROLL, block_rows=64, stream_loop='peel', prefetch=2),
    ],
}


def main():
  import jax
  import bench as bench_mod
  from experiments.exp33_big_blocks import measure
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
