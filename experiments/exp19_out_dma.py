"""Round-3 experiment 19: manual output DMA (out_dma) measurements.

VERDICT r2 item 2 candidate (b): bypass the Pallas output-block
pipeline with explicit double-buffered staging + async copies. Targets
the ~2us per-grid-step fixed cost capping 256^3 jacobi3d at 0.45, and
the blur/jacobi3d bench shapes.

Run ON TPU (alone): python experiments/exp19_out_dma.py
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

  def run(tag, stencil, shape, build):
    try:
      ex = build()
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> %-36s %.3f (%.3f ms, compile %.0fs)' %
          (tag, frac, dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('%-36s FAILED: %s' % (tag, str(e).splitlines()[0][:110]))

  # 256^3 jacobi3d: the per-step fixed-cost wall
  shape = (256, 256, 256)
  s256 = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  for blk in (8, 16, 32):
    for dma in (False, True):
      run('256^3 mid=128 blk=%d dma=%d' % (blk, dma), s256, shape,
          lambda blk=blk, dma=dma: MidTiledPallasExecutor(
              s256, shape, mid_tile=128, block_rows=blk, out_dma=dma))

  # bench shapes: does out_dma move the already-fast configs?
  sj = corpus.build('jacobi3d', tile_size=(128, 32, 0))
  run('bench jacobi3d b128 dma=1', sj, (2048, 32, 128),
      lambda: PallasExecutor(sj, (2048, 32, 128), block_rows=128,
                             out_dma=True))
  sb = corpus.build('blur', tile_size=(2048, 0))
  run('bench blur b512 dma=1', sb, (8192, 2048),
      lambda: PallasExecutor(sb, (8192, 2048), block_rows=512,
                             out_dma=True))


if __name__ == '__main__':
  main()
