"""Round-2 experiment 10: fused-sweep scaling of the f32 2-D kernels.

jacobi2d measures 0.65 of roofline vs a 0.78 op-model prediction.
Sweep-count scaling separates the hypotheses: per-sweep compute cost
(scales with iterate) vs fixed per-step overhead (does not).

Run ON TPU: python experiments/exp10_sweepscale.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  from bench import peak_bandwidth
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes

  peak = peak_bandwidth(jax.devices()[0])
  shape = (8192, 2048)
  for name in ('jacobi2d', 'seidel2d'):
    for it in (1, 2, 4):
      try:
        ov = {'tile_size': (2048, 0), 'iterate': it}
        if name == 'seidel2d':
          ov['optimizations'] = {'computation-reuse': 'greedy'}
        st = corpus.build(name, **ov)
        ex = PallasExecutor(st, shape, block_rows=256)
        inputs = reference.make_test_inputs(st, shape)
        args = list(ex.prepare(inputs))
        in_b, out_b = stream_bytes(st, shape)
        dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                           (in_b + out_b) / (peak * 1e9))
        frac = (in_b + out_b) / dt / 1e9 / peak
        per_sweep_us = dt * 1e6 / it
        log('%-9s iterate=%d block=%d: %.3f ms roofline=%.3f '
            '(%.1f us/sweep)' %
            (name, it, ex.block_rows, dt * 1e3, frac, per_sweep_us))
      except Exception as e:  # noqa: BLE001
        log('%s it=%d FAILED: %s' % (name, it,
                                     str(e).splitlines()[0][:120]))


if __name__ == '__main__':
  main()
