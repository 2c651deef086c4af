"""Round-2 experiment 5: mid-axis grid blocking perf (256^3 jacobi3d).

Round 1 ran mid tiles as a serialized Python loop of kernel calls
(~26% of roofline at 256^3); tiles now pipeline inside one Pallas grid.

Run ON TPU: python experiments/exp5_midgrid.py
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
  log('device: %s peak %.0f' % (jax.devices()[0], peak))

  shape = (256, 256, 256)
  stencil = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  for mid_tile in (None, 64, 128):
    try:
      ex = MidTiledPallasExecutor(stencil, shape, mid_tile=mid_tile)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, compile_s = slope_time(ex.fn, args, chain_input_index(stencil),
                                 (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('jacobi3d 256^3 mid_tile=%s(%d) block=%d grid=(%d,%d): '
          '%.3f ms roofline=%.3f (compile %.0fs)' %
          (mid_tile, ex.mid_tile, ex.block_rows, ex.grid_m, ex.grid,
           dt * 1e3, frac, compile_s))
      # spot correctness on hardware
      want = reference.run(stencil, inputs)
      got = ex(inputs)
      region = reference.output_valid_slices(stencil, shape)
      w = want['t0'][region]
      g = np.asarray(got['t0'])[region]
      err = np.max(np.abs(w - g) / np.maximum(np.abs(w), 1e-30))
      log('  max rel err vs oracle: %.3g %s' %
          (err, 'OK' if err < 1e-5 else 'FAIL'))
    except Exception as e:  # noqa: BLE001
      log('mid_tile=%s FAILED: %s' %
          (mid_tile, str(e).splitlines()[0][:160]))


if __name__ == '__main__':
  main()
