"""Round-3 experiment 17: 256^3 jacobi3d per-step fixed-cost attack.

Round-2 diagnosis: wall = ~2us fixed per grid step x >= 64 forced
steps (VMEM caps per-step output); pure-DMA replay bound 0.70.
Candidates here:
  1. NO mid tiling at all: the full 256x256 cross-section with small
     blocks — halves the step count (no mid-tile doubling) and removes
     mid-halo re-reads; the VMEM estimator rejects it but is known
     conservative, so force block_rows and let Mosaic judge.
  2. the round-2 best (mid_tile=128) for reference.

Run ON TPU (alone): python experiments/exp17_jacobi256.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import (MidTiledPallasExecutor,
                                              PallasExecutor)
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (256, 256, 256)
  stencil = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  region = reference.output_valid_slices(stencil, shape)

  def run(tag, build):
    try:
      ex = build()
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      g = np.asarray(ex(inputs)['t0'])[region]
      w = want['t0'][region]
      err = np.max(np.abs(w - g) / np.maximum(np.abs(w), 1e-30))
      log('>>> %-26s %.3f ms roofline=%.3f err=%.2g %s' %
          (tag, dt * 1e3, frac, err, 'OK' if err < 1e-5 else 'FAIL'))
    except Exception as e:  # noqa: BLE001
      log('%-26s FAILED: %s' % (tag, str(e).splitlines()[0][:120]))

  run('mid=128 (r2 best)',
      lambda: MidTiledPallasExecutor(stencil, shape, mid_tile=128))
  for blk in (8, 16, 24, 32):
    run('no-mid block=%d' % blk,
        lambda blk=blk: PallasExecutor(stencil, shape, block_rows=blk))


if __name__ == '__main__':
  main()
