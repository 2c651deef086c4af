"""Round-4 experiment 42: peel x small power-of-2 blocks on 2-D.

exp41 showed the peel x small-block JOINT (not either alone) is what
pays on 3-D slabs (denoise3d b16 0.737). The 2-D probes so far only
tried peel at b48/b80/b96/b160 — all NON-powers-of-2, all sharply
worse than their power-of-2 neighbors (denoise2d peel: b48 0.411,
b64 0.659, b80 0.429) — so the small-block end (b32/b16) was never
actually measured on the 2-D kernels. Probe it where headroom exists.
Wins land in the autotune cache (same tkey the bench reads).

Run ON TPU (alone): python experiments/exp42_peel_smallblocks_2d.py
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
    'jacobi2d': [
        {'stream_loop': 'peel', 'block_rows': 64},
        {'stream_loop': 'peel', 'block_rows': 32},
        dict(ROLL, block_rows=64, stream_loop='peel'),
    ],
    'seidel2d': [
        dict(ROLL, block_rows=64, stream_loop='peel'),
        dict(ROLL, block_rows=32, stream_loop='peel'),
    ],
    'denoise2d': [
        dict(ROLL, block_rows=32, stream_loop='peel'),
        dict(ROLL, block_rows=16, stream_loop='peel'),
    ],
    'erosion': [
        dict(HYB, block_rows=64, lane_shift='rotate',
             stream_loop='peel'),
        dict(HYB, block_rows=32, lane_shift='rotate',
             stream_loop='peel'),
    ],
    'xcorr': [
        dict(HYB, block_rows=64, lane_shift='rotate',
             stream_loop='peel'),
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
