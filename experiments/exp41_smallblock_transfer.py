"""Round-4 experiment 41: transfer exp40's small-block win to the
bench shapes.

exp39/40 found 256^3 jacobi3d's DMA-grant cost shrinks with the block
(peel+roll b16 0.67). denoise3d (2048x32x128, 0.63-0.64) has the same
3-D slab structure and the most headroom of the 3-D bench kernels —
probe roll at b32/b16, prefetch joints, and the peel+small-block combo
today's fleet finally compiles. Plus the untried xcorr b352 joints.
Wins land in the autotune cache (same tkey the bench reads).

Run ON TPU (alone): python experiments/exp41_smallblock_transfer.py
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
    'denoise3d': [
        dict(ROLL, block_rows=32),
        dict(ROLL, block_rows=16),
        dict(ROLL, block_rows=32, prefetch=2),
        dict(ROLL, block_rows=32, stream_loop='peel'),
        dict(ROLL, block_rows=16, stream_loop='peel'),
    ],
    'xcorr': [
        dict(HYB, block_rows=352, lane_shift='rotate', prefetch=2),
        dict(HYB, block_rows=368, lane_shift='rotate'),
        dict(HYB, block_rows=336, lane_shift='rotate'),
    ],
    'erosion': [
        dict(HYB, block_rows=256, lane_shift='rotate', prefetch=2),
        dict(HYB, block_rows=448, lane_shift='rotate', prefetch=2),
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
