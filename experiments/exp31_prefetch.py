"""Round-3 experiment 31: deep input prefetch on the real kernels.

exp30 decomposes the ~2us/step fixed cost synthetically (block size vs
DMA count vs prefetch depth); this measures the builder's new
``prefetch`` knob on the workload the wall actually caps: 256^3
jacobi3d (64+ grid steps). prefetch > 2 disables the rolling fill, so
interior steps re-read the halo (b=16, halo 2 -> 1.125x read
amplification) but every fill has depth-1 steps of DMA latency to
hide. Also spots 2-D many-step configs (denoise2d b128: 64 steps).

Run ON TPU (alone): python experiments/exp31_prefetch.py
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
      inputs = reference.make_test_inputs(stencil, shape)
      want = reference.run(stencil, inputs)
      region = reference.output_valid_slices(stencil, shape)
      ex = build()
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      out0 = stencil.output_names[0]
      g = np.asarray(ex(inputs)[out0])[region]
      w = want[out0][region]
      if stencil.symbol_table[out0].is_float:
        t = 1e-4
        d = np.abs(w.astype(np.float64) - g.astype(np.float64))
        bad = (d > t) & (d > t * np.abs(w.astype(np.float64)))
        err = int(bad.sum())
        ok = err == 0
      else:
        err = np.max(np.abs(w.astype(np.int64) - g.astype(np.int64)))
        ok = err == 0
      log('>>> %-36s %.3f ms roofline=%.3f err=%.2g %s' %
          (tag, dt * 1e3, frac, err, 'OK' if ok else 'FAIL'))
    except Exception as e:  # noqa: BLE001
      log('%-36s FAILED: %s' % (tag, str(e).splitlines()[0][:120]))

  # 256^3 jacobi3d: the ~2us/step wall (0.447 at the rolling d2 seed)
  st3 = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  shape3 = (256, 256, 256)
  for tag, kw in [
      ('jacobi3d mid=128 grid d2 (seed)', {}),
      ('jacobi3d mid=128 grid d3', dict(prefetch=3)),
      ('jacobi3d mid=128 grid d4', dict(prefetch=4)),
      ('jacobi3d mid=128 peel d3',
       dict(prefetch=3, stream_loop='peel')),
      ('jacobi3d mid=128 peel d4',
       dict(prefetch=4, stream_loop='peel')),
      ('jacobi3d mid=128 b8 peel d4',
       dict(prefetch=4, stream_loop='peel', block_rows=8)),
  ]:
    kw = dict(kw)
    br = kw.pop('block_rows', None)
    run(tag, st3, shape3,
        lambda kw=kw, br=br: MidTiledPallasExecutor(
            st3, shape3, mid_tile=128,
            **(dict(block_rows=br) if br else {}), **kw))

  # denoise2d roll b128: most grid steps of any 2-D seed (64)
  std = corpus.build('denoise2d', tile_size=(2048, 0))
  shaped = (8192, 2048)
  for tag, kw in [
      ('denoise2d roll b128 d2 (seed)', {}),
      ('denoise2d roll b128 d3', dict(prefetch=3)),
      ('denoise2d roll b128 peel d3',
       dict(prefetch=3, stream_loop='peel')),
  ]:
    run(tag, std, shaped,
        lambda kw=kw: PallasExecutor(
            std, shaped, block_rows=128, stage_mode='value',
            shift_mode='roll', **kw))


if __name__ == '__main__':
  main()
