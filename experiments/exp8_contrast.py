"""Round-2 experiment 8: contrast (17x17 dense table) strategy search.

The DAC'20 CR schedule minimizes op count (393 -> 143) but leaves ~95
values live at once — Mosaic spills and the kernel runs at 0.067 of
roofline. Compare: CR method x stage mode x shape (rotate-narrow rows).

Run ON TPU: python experiments/exp8_contrast.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def run_case(tag, shape, tile, overrides, ex_opts):
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes
  from bench import peak_bandwidth

  peak = peak_bandwidth(jax.devices()[0])
  stencil = corpus.build('contrast', tile_size=tile, **overrides)
  ex = PallasExecutor(stencil, shape, **ex_opts)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  in_b, out_b = stream_bytes(stencil, shape)
  dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                      (in_b + out_b) / (peak * 1e9))
  frac = (in_b + out_b) / dt / 1e9 / peak
  log('%-34s block=%-4d mode=%-5s %.3f ms roofline=%.3f (compile %.0fs)'
      % (tag, ex.block_rows, ex.stage_mode, dt * 1e3, frac, cs))


CR_G = {'optimizations': {'computation-reuse': 'greedy'}}
CR_Y = {'optimizations': {'computation-reuse': 'yes'}}


def main():
  cases = (
      ('no-CR 512w', (32768, 512), (512, 0), {}, {}),
      ('no-CR 256w rotate', (65536, 256), (256, 0), {}, {}),
      ('greedy 512w vmem', (32768, 512), (512, 0), CR_G,
       {'stage_mode': 'vmem'}),
      ('greedy 256w rotate value', (65536, 256), (256, 0), CR_G, {}),
      ('native 512w vmem', (32768, 512), (512, 0), CR_Y,
       {'stage_mode': 'vmem'}),
  )
  for tag, shape, tile, ov, opts in cases:
    try:
      run_case(tag, shape, tile, ov, opts)
    except Exception as e:  # noqa: BLE001
      log('%-34s FAILED: %s' % (tag, str(e).splitlines()[0][:130]))


if __name__ == '__main__':
  main()
