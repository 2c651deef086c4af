"""Round-3 experiment 21: contrast under roll-shift value mode.

exp20 measured roll mode over the 2-D corpus but never on contrast
(its 17x17 table + native CR keeps ~95 reuse values live; the round-2
seed is slice-mode value at (32768, 512)). Contrast's CR ops load at
scattered 2-axis offsets, where a windowed misaligned slice measures
~4.5 slots vs two rotates at ~1.5+1.5 — if the 394-slot/cell measured
compute is shift-dominated, roll could be worth ~25%.

Run ON TPU (alone): python experiments/exp21_contrast_roll.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


CASES = (
    # (label, overrides, opts)
    ('seed-repro', {}, {}),
    ('roll', {}, {'stage_mode': 'value', 'shift_mode': 'roll'}),
    ('roll b64', {}, {'stage_mode': 'value', 'shift_mode': 'roll',
                      'block_rows': 64}),
    ('roll b128', {}, {'stage_mode': 'value', 'shift_mode': 'roll',
                       'block_rows': 128}),
    ('roll 1024w', {'tile_size': (1024, 0)},
     {'stage_mode': 'value', 'shift_mode': 'roll'}),
)


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))

  for label, ov, opts in CASES:
    tile = ov.get('tile_size', (512, 0))
    shape = (32768 * 512 // tile[0], tile[0])
    try:
      stencil = corpus.build('contrast', tile_size=tile,
                             optimizations={'computation-reuse': 'yes'})
      ex = PallasExecutor(stencil, shape, **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> contrast %-10s %.4f  %.3f ms  c=%.0fs  blk=%d' %
          (label, frac, dt * 1e3, cs, ex.block_rows))
    except Exception as e:  # noqa: BLE001
      log('contrast %-10s FAILED: %s' %
          (label, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  main()
