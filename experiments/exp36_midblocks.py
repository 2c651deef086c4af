"""Round-4 experiment 36: intermediate block sizes (1.25-1.75x).

Every block sweep so far (exp26, exp33, the bench probe loop) moved in
powers of two: 128 -> 256 -> 512 -> 1024. But 512 is exactly the
fleet-flaky compile boundary for the hybrid/roll kernels (exp33 saw
most 512+ configs HTTP-500, while erosion's b512 compiled in one
session and won +8%). The points BETWEEN 256 and 512 were never
measured: if 320/384/448 compile reliably and capture most of the
fewer-grid-steps win, the sub-0.8 kernels get a stable uplift instead
of a lottery ticket.

Wins > 3% are written into the autotune cache (the exact tkey the
bench reads), so the driver bench inherits them without code changes.

Run ON TPU (alone): python experiments/exp36_midblocks.py [names...]
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
        dict(HYB, block_rows=320, lane_shift='rotate'),
        dict(HYB, block_rows=384, lane_shift='rotate'),
        dict(HYB, block_rows=448, lane_shift='rotate'),
        dict(HYB, block_rows=640, lane_shift='rotate'),
    ],
    'sobel2d': [
        {'lane_shift': 'slice', 'block_rows': 320},
        {'lane_shift': 'slice', 'block_rows': 384},
        {'lane_shift': 'slice', 'block_rows': 448},
    ],
    'xcorr': [
        dict(HYB, block_rows=320, lane_shift='rotate'),
        dict(HYB, block_rows=384, lane_shift='rotate'),
        dict(HYB, block_rows=448, lane_shift='rotate'),
    ],
    'jacobi2d': [
        dict(ROLL, block_rows=320),
        dict(ROLL, block_rows=384),
        dict(ROLL, block_rows=448),
        {'stream_loop': 'peel'},  # re-measure: 0.200-0.258 variance
    ],
    'seidel2d': [
        dict(ROLL, block_rows=320),
        dict(ROLL, block_rows=384),
        dict(ROLL, block_rows=192, stream_loop='peel'),
    ],
    'denoise2d': [
        dict(ROLL, block_rows=192),
        dict(ROLL, block_rows=96, stream_loop='peel'),
    ],
    'denoise3d': [
        dict(ROLL, block_rows=96),
        dict(ROLL, block_rows=48),
        dict(ROLL, block_rows=64, lane_shift='rotate'),
    ],
    'blur': [
        dict(ROLL, block_rows=640),
        dict(ROLL, block_rows=768),
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
