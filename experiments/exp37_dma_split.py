"""Round-4 experiment 37: dma_split on the REAL kernels.

exp30's pure-DMA replay of the 256^3 slab pattern measured +7% from
issuing each step's in-copy as 4 back-to-back sub-DMAs (grant
overlap: blk4 0.870 -> split4 0.934). The knob now exists on
PallasExecutor (3-D only). Measure it jointly with the best-known
256^3 config (peel+roll mid128, 0.512 in exp28/34) and on the
bench-shape 3-D kernels; wins > 3% go into the autotune cache (the
exact tkey the bench reads).

Run ON TPU (alone): python experiments/exp37_dma_split.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


PEEL_ROLL = {'stream_loop': 'peel', 'stage_mode': 'value',
             'shift_mode': 'roll'}


def run_256(peak):
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes

  st = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  shape = (256, 256, 256)
  inputs = reference.make_test_inputs(st, shape)
  in_b, out_b = stream_bytes(st, shape)
  est = (in_b + out_b) / (peak * 1e9)
  want = None

  cases = [
      ('peel+roll mid128 (seed)', dict(PEEL_ROLL, mid_tile=128)),
      ('peel+roll mid128 split2', dict(PEEL_ROLL, mid_tile=128,
                                       dma_split=2)),
      ('peel+roll mid128 split4', dict(PEEL_ROLL, mid_tile=128,
                                       dma_split=4)),
      ('roll mid128 split2', {'stage_mode': 'value',
                              'shift_mode': 'roll', 'mid_tile': 128,
                              'dma_split': 2}),
      ('peel+roll mid64 split2', dict(PEEL_ROLL, mid_tile=64,
                                      dma_split=2)),
      ('peel+roll mid128 split2 pf3', dict(PEEL_ROLL, mid_tile=128,
                                           dma_split=2, prefetch=3)),
  ]
  for tag, kw in cases:
    try:
      kw = dict(kw)
      mt = kw.pop('mid_tile')
      ex = MidTiledPallasExecutor(st, shape, mid_tile=mt, **kw)
      args = list(ex.prepare(inputs))
      dt, _ = slope_time(ex.fn, args, chain_input_index(st), est,
                         reps=2)
      frac = (in_b + out_b) / dt / 1e9 / peak
      if want is None:
        want = reference.run(st, inputs)
      region = reference.output_valid_slices(st, shape)
      got = np.asarray(ex(inputs)['t0'])[region]
      nbad = int((got != want['t0'][region]).sum())
      log('>>> %-28s %.3f ms roofline=%.3f err=%d' %
          (tag, dt * 1e3, frac, nbad))
    except Exception as e:  # noqa: BLE001
      log('%-32s FAILED: %s' % (tag, str(e).splitlines()[0][:110]))


def run_bench_shapes(peak):
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.tools import autotune
  from experiments.exp33_big_blocks import measure
  kind = getattr(jax.devices()[0], 'device_kind', '?')
  tpath = os.path.expanduser(autotune.DEFAULT_CACHE)
  for name, shape, overrides, seeds in bench_mod.CONFIGS:
    if len(shape) < 3:
      continue
    stencil = corpus.build(name, **overrides)
    tkey = autotune._key(stencil, tuple(shape), kind)
    table = autotune._load(tpath)
    seed_cfg = dict(table.get(tkey, {}).get('config') or seeds[0])
    try:
      dt0, f0 = measure(stencil, shape, seed_cfg, peak)
      log('%-10s SEED %-58s %.3f ms frac=%.3f' %
          (name, seed_cfg, dt0 * 1e3, f0))
    except Exception as e:  # noqa: BLE001
      log('%-10s SEED FAILED %s' % (name, str(e).splitlines()[0][:70]))
      continue
    for split in (2, 4):
      cfg = dict(seed_cfg, dma_split=split)
      try:
        dt, f = measure(stencil, shape, cfg, peak)
      except Exception as e:  # noqa: BLE001
        log('%-10s      split%d FAILED %s' %
            (name, split, str(e).splitlines()[0][:60]))
        continue
      verdict = 'WIN' if dt < dt0 * 0.97 else ''
      log('%-10s      split%d %.3f ms frac=%.3f %s' %
          (name, split, dt * 1e3, f, verdict))
      if dt < dt0:
        table = autotune._load(tpath)
        table[tkey] = {'stencil': stencil.app_name,
                       'shape': list(shape), 'device': kind,
                       'config': cfg, 'ms': round(dt * 1e3, 4)}
        autotune._store(tpath, table)
        dt0 = dt
        log('%-10s CACHED %-54s %.3f ms' % (name, cfg, dt * 1e3))


def main():
  import jax
  from soda_tpu.profiling import peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  which = sys.argv[1:] or ['256', 'bench']
  if '256' in which:
    run_256(peak)
  if 'bench' in which:
    run_bench_shapes(peak)


if __name__ == '__main__':
  main()
