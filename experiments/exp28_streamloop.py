"""Round-3 experiment 28: stream_loop on the real kernels.

exp27 isolates Pallas grid-entry overhead synthetically; this runs the
REAL fused executors with stream_loop=True (one kernel invocation,
in-kernel fori_loop over all blocks, out_dma staging) against the
grid-stepped seeds:

  - 256^3 jacobi3d, mid=128 (the ~2us/step wall: 128 grid steps)
  - 2-D spot checks (blur roll 512-block; erosion hybrid) to see the
    fixed-cost delta where steps are few/cheap

Run ON TPU (alone): python experiments/exp28_streamloop.py
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
        # the reference's pass criterion (frt/host.py:633-657): an
        # element fails only if off by > t absolutely AND relatively
        # (cancelling sums near zero legitimately blow up plain rel)
        t = 1e-3 if tag.startswith('contrast') else 1e-4
        d = np.abs(w.astype(np.float64) - g.astype(np.float64))
        bad = (d > t) & (d > t * np.abs(w.astype(np.float64)))
        err = int(bad.sum())
        ok = err == 0
      else:
        err = np.max(np.abs(w.astype(np.int64) - g.astype(np.int64)))
        ok = err == 0
      log('>>> %-34s %.3f ms roofline=%.3f err=%.2g %s' %
          (tag, dt * 1e3, frac, err, 'OK' if ok else 'FAIL'))
    except Exception as e:  # noqa: BLE001
      log('%-34s FAILED: %s' % (tag, str(e).splitlines()[0][:120]))

  # 256^3 jacobi3d: the target workload
  st3 = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  shape3 = (256, 256, 256)
  for tag, kw in [
      ('jacobi3d mid=128 grid (seed)', {}),
      ('jacobi3d mid=128 out_dma', dict(out_dma=True)),
      ('jacobi3d mid=128 stream_loop', dict(stream_loop=True)),
      ('jacobi3d mid=128 peel', dict(stream_loop='peel')),
      ('jacobi3d mid=128 loop+roll',
       dict(stream_loop=True, stage_mode='value', shift_mode='roll')),
      ('jacobi3d mid=128 peel+roll',
       dict(stream_loop='peel', stage_mode='value', shift_mode='roll')),
  ]:
    run(tag, st3, shape3,
        lambda kw=kw: MidTiledPallasExecutor(st3, shape3, mid_tile=128,
                                             **kw))

  # 2-D spots: blur (roll seed, 512-row blocks) + erosion hybrid
  stb = corpus.build('blur', tile_size=(2048, 0))
  shapeb = (8192, 2048)
  for tag, kw in [
      ('blur roll b512 grid (seed)', {}),
      ('blur roll b512 stream_loop', dict(stream_loop=True)),
      ('blur roll b512 peel', dict(stream_loop='peel')),
  ]:
    run(tag, stb, shapeb,
        lambda kw=kw: PallasExecutor(
            stb, shapeb, block_rows=512, stage_mode='value',
            shift_mode='roll', **kw))

  ste = corpus.build('erosion', tile_size=(2048, 0),
                     optimizations={'computation-reuse': 'greedy'})
  shapee = (8192, 2048)
  for tag, kw in [
      ('erosion hybrid b256 grid (seed)', {}),
      ('erosion hybrid b256 stream_loop', dict(stream_loop=True)),
      ('erosion hybrid b256 peel', dict(stream_loop='peel')),
  ]:
    run(tag, ste, shapee,
        lambda kw=kw: PallasExecutor(
            ste, shapee, block_rows=256, stage_mode='value',
            shift_mode='roll', transpose_lanes='on', **kw))

  # contrast: the corpus' many-step config (32768 rows -> 100+ grid
  # steps at the default block); if ANY per-step entry cost is
  # unhidden behind its compute-bound body, peel shows it here
  stc = corpus.build('contrast', tile_size=(512, 0),
                     optimizations={'computation-reuse': 'yes'})
  shapec = (32768, 512)
  for tag, kw in [
      ('contrast b(auto) grid (seed)', {}),
      ('contrast b(auto) peel', dict(stream_loop='peel')),
  ]:
    run(tag, stc, shapec, lambda kw=kw: PallasExecutor(stc, shapec, **kw))

  # jacobi3d at the BENCH shape (16 stream steps x 16 mid tiles at the
  # seed config): if peel wins here it goes straight into CONFIGS
  stj = corpus.build('jacobi3d', tile_size=(128, 32, 0))
  shapej = (2048, 32, 128)
  for tag, kw in [
      ('jacobi3d bench b128 grid (seed)', {}),
      ('jacobi3d bench b128 peel', dict(stream_loop='peel')),
  ]:
    run(tag, stj, shapej,
        lambda kw=kw: PallasExecutor(stj, shapej, block_rows=128, **kw))

  # denoise2d roll b128 (64 steps: the most steps of any 2-D seed)
  std = corpus.build('denoise2d', tile_size=(2048, 0))
  shaped = (8192, 2048)
  for tag, kw in [
      ('denoise2d roll b128 grid (seed)', {}),
      ('denoise2d roll b128 peel', dict(stream_loop='peel')),
  ]:
    run(tag, std, shaped,
        lambda kw=kw: PallasExecutor(
            std, shaped, block_rows=128, stage_mode='value',
            shift_mode='roll', **kw))

  # seidel2d: mid-pack 2-D kernel (32 steps at b256, roll seed)
  sts = corpus.build('seidel2d', tile_size=(2048, 0),
                     optimizations={'computation-reuse': 'greedy'})
  shapes_ = (8192, 2048)
  for tag, kw in [
      ('seidel2d roll b256 grid (seed)', {}),
      ('seidel2d roll b256 peel', dict(stream_loop='peel')),
  ]:
    run(tag, sts, shapes_,
        lambda kw=kw: PallasExecutor(
            sts, shapes_, block_rows=256, stage_mode='value',
            shift_mode='roll', **kw))


if __name__ == '__main__':
  main()
