"""Round-2 experiment 3: promoted-width stage values + DMA ceiling.

exp2 found i16 min/mul still un-legalizable and hinted i16 ALU traffic
is slow, so value mode now keeps sub-32-bit integer stages at i32
(semantics.wrap_promoted): one widen per input, one narrow per output,
no per-stage relayouts. This measures the effect on the four
below-bar kernels, plus the copy-kernel DMA ceiling at legal block
sizes (exp2 forced block=512 which exceeds the VMEM budget).

Run ON TPU: python experiments/exp3_promoted.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def copy_ceiling(block_rows, dtype='float32', shape=(8192, 2048)):
  import jax
  from bench import peak_bandwidth, slope_time
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor

  ctype = {'float32': 'float', 'uint16': 'uint16'}[dtype]
  src = ('kernel: copycat\nburst width: 64\nunroll factor: 1\n'
         'iterate: 1\nborder: ignore\ncluster: none\n'
         'input dram 0 %s: a(%d, *)\n'
         'output dram 1 %s: b(0, 0) = a(0, 0)\n'
         % (ctype, shape[-1], ctype))
  stencil = api.build_stencil(src)
  peak = peak_bandwidth(jax.devices()[0])
  ex = PallasExecutor(stencil, shape, block_rows=block_rows)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  bytes_per = 2 * float(np.prod(shape)) * np.dtype(dtype).itemsize
  dt, _ = slope_time(ex.fn, args, 0, bytes_per / (peak * 1e9))
  log('copy %s block=%d: %.3f ms  %.1f GB/s  (%.1f%% of %.0f)' %
      (dtype, ex.block_rows, dt * 1e3, bytes_per / dt / 1e9,
       100 * bytes_per / dt / 1e9 / peak, peak))


CASES = (
    ('blur', (8192, 2048), {'tile_size': (2048, 0)}),
    ('jacobi2d', (8192, 2048), {'tile_size': (2048, 0)}),
    ('seidel2d', (8192, 2048), {'tile_size': (2048, 0),
                                'optimizations': {'computation-reuse':
                                                  'greedy'}}),
    ('erosion', (8192, 2048), {'tile_size': (2048, 0),
                               'optimizations': {'computation-reuse':
                                                 'greedy'}}),
    ('sobel2d', (8192, 2048), {'tile_size': (2048, 0)}),
    ('xcorr', (8192, 2048), {'tile_size': (2048, 0),
                             'optimizations': {'computation-reuse':
                                               'greedy'}}),
)


def main():
  import jax
  from bench import bench_kernel, peak_bandwidth

  dev = jax.devices()[0]
  peak = peak_bandwidth(dev)
  log('device: %s peak %.0f GB/s' % (dev, peak))

  for blk in (128, 256):
    try:
      copy_ceiling(blk)
    except Exception as e:  # noqa: BLE001
      log('copy block=%d FAILED: %s' % (blk, str(e).splitlines()[0][:150]))

  results = {}
  for name, shape, overrides in CASES:
    t0 = time.time()
    try:
      frac, gbps, cps, dt, _ = bench_kernel(
          name, shape, overrides, peak,
          ex_opts={'stage_mode': 'value'}, compare_xla=False)
      results[name] = frac
      log('>>> %s roofline=%.3f (%.0fs)' % (name, frac, time.time() - t0))
    except Exception as e:  # noqa: BLE001
      log('>>> %s FAILED: %r' % (name, e))

  log('--- summary (r1 baseline: blur .71 jacobi2d .59 seidel2d .42 '
      'erosion .21) ---')
  for name, frac in results.items():
    log('%-10s %.3f' % (name, frac))


if __name__ == '__main__':
  main()
