"""Round-2 experiment 7: 256^3 jacobi3d block-size probe.

The VMEM estimator picks block=8 at mid_tile=128; reality is leaner
(2-stage pipeline). Probe larger explicit blocks.

Run ON TPU: python experiments/exp7_block256.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  from bench import chain_input_index, peak_bandwidth, slope_time, \
      stream_bytes
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor

  peak = peak_bandwidth(jax.devices()[0])
  shape = (256, 256, 256)
  stencil = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  inputs = reference.make_test_inputs(stencil, shape)
  for mt, blk in ((128, 16), (128, 24), (128, 32), (64, 32), (64, 64)):
    try:
      ex = MidTiledPallasExecutor(stencil, shape, mid_tile=mt,
                                  block_rows=blk)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('mt=%d blk=%d grid=(%d,%d): %.3f ms roofline=%.3f '
          '(compile %.0fs)' %
          (mt, ex.block_rows, ex.grid_m, ex.grid, dt * 1e3, frac, cs))
    except Exception as e:  # noqa: BLE001
      log('mt=%s blk=%s FAILED: %s' %
          (mt, blk, str(e).splitlines()[0][:130]))


if __name__ == '__main__':
  main()
