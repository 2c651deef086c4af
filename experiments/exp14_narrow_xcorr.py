"""Round-3 experiment 14: narrow-i16 stage evaluation on xcorr.

exp13 proved Mosaic legalizes i16 add folds + shifted slices; the
narrow16 analysis admits 8/9 of CR'd xcorr's stages. Measure the
{lane_shift} x {narrow} matrix vs the round-2 seed (rotate, 0.30-0.32).
Bypasses bench_kernel (its autotune-cache overlay would override the
explicit configs).

Run ON TPU (alone): python experiments/exp14_narrow_xcorr.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def measure(name, shape, overrides, opts, peak):
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, stream_bytes

  stencil = corpus.build(name, **overrides)
  ex = PallasExecutor(stencil, shape, **opts)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  in_b, out_b = stream_bytes(stencil, shape)
  est = (in_b + out_b) / (peak * 1e9)
  dt, _ = slope_time(ex.fn, args, chain_input_index(stencil), est)
  return (in_b + out_b) / dt / 1e9 / peak


def main():
  import jax
  from soda_tpu.profiling import peak_bandwidth

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (8192, 2048)
  cr = {'tile_size': (2048, 0),
        'optimizations': {'computation-reuse': 'greedy'}}
  plain = {'tile_size': (2048, 0)}

  for tag, overrides, opts in (
      ('cr rotate narrow=off (r2 seed)', cr,
       {'lane_shift': 'rotate', 'block_rows': 256, 'narrow': 'off'}),
      ('cr rotate narrow=auto', cr,
       {'lane_shift': 'rotate', 'block_rows': 256, 'narrow': 'on'}),
      ('cr slice narrow=off', cr,
       {'lane_shift': 'slice', 'block_rows': 256, 'narrow': 'off'}),
      ('cr slice narrow=auto', cr,
       {'lane_shift': 'slice', 'block_rows': 256, 'narrow': 'on'}),
      ('plain slice narrow=auto', plain,
       {'lane_shift': 'slice', 'block_rows': 256, 'narrow': 'on'}),
      ('cr slice narrow=auto b512', cr,
       {'lane_shift': 'slice', 'block_rows': 512, 'narrow': 'on'}),
  ):
    try:
      frac = measure('xcorr', shape, overrides,
                     dict(opts, stage_mode='value'), peak)
      log('>>> xcorr %-28s %.3f' % (tag, frac))
    except Exception as e:  # noqa: BLE001
      log('xcorr %-28s FAILED: %s' % (tag, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  main()
