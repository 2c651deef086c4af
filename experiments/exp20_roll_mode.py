"""Round-3 experiment 20: roll-shift value mode across the 2-D corpus.

exp16 showed isolated rotate-style chains run near 1 cycle/vreg-op
while windowed slab slices cost 2.6-4.5 slots; pltpu.roll axis=0 now
legalizes (exp12). shift_mode='roll' evaluates every stage at full
slab extent with all shifted loads as rotates. Measure against the
round-2 seeds.

Run ON TPU (alone): python experiments/exp20_roll_mode.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


CASES = (
    # (name, overrides, opts, r2 seed frac)
    ('erosion', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 256}, 0.338),
    ('xcorr', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 256}, 0.291),
    ('jacobi2d', {}, {'block_rows': 256}, 0.660),
    ('seidel2d', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 256}, 0.665),
    ('sobel2d', {}, {'block_rows': 256}, 0.553),
    ('denoise2d', {}, {'block_rows': 128}, 0.529),
    ('blur', {}, {'block_rows': 512}, 0.849),
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
  shape = (8192, 2048)

  for name, ov, opts, seed in CASES:
    try:
      stencil = corpus.build(name, tile_size=(2048, 0), **ov)
      ex = PallasExecutor(stencil, shape, stage_mode='value',
                          shift_mode='roll', **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> %-10s roll %.3f  (seed %.3f, %+0.1f%%)  %.3f ms c=%.0fs' %
          (name, frac, seed, 100 * (frac / seed - 1), dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('%-10s roll FAILED: %s' % (name, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  main()
