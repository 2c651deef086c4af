"""Round-4 experiment 40: combine exp39's two independent 256^3 wins.

exp39 (fleet retry) measured peel+roll mid64 b16 at 0.639 and
peel+roll mid64 prefetch2 at 0.629 — both past the 0.55 target that
exp34's fleet refused to compile. The two attack the same DMA-grant
chain from different ends (fewer larger grants vs deeper overlap), so
the combination plus nearby block sizes decides the final seed.

Run ON TPU (alone): python experiments/exp40_jacobi256_combine.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


PEEL_ROLL = {'stream_loop': 'peel', 'stage_mode': 'value',
             'shift_mode': 'roll'}


def main():
  import jax
  import numpy as np
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      peak_bandwidth, stream_bytes

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  st = corpus.build('jacobi3d', tile_size=(256, 256, 0))
  shape = (256, 256, 256)
  inputs = reference.make_test_inputs(st, shape)
  in_b, out_b = stream_bytes(st, shape)
  est = (in_b + out_b) / (peak * 1e9)
  want = None

  cases = [
      ('mid64 b16 (exp39 best)', dict(PEEL_ROLL, mid_tile=64,
                                      block_rows=16)),
      ('mid64 b16 pf2', dict(PEEL_ROLL, mid_tile=64, block_rows=16,
                             prefetch=2)),
      ('mid64 b16 pf3', dict(PEEL_ROLL, mid_tile=64, block_rows=16,
                             prefetch=3)),
      ('mid64 b24 pf2', dict(PEEL_ROLL, mid_tile=64, block_rows=24,
                             prefetch=2)),
      ('mid64 b32 pf2', dict(PEEL_ROLL, mid_tile=64, block_rows=32,
                             prefetch=2)),
      ('mid128 b16 pf2', dict(PEEL_ROLL, mid_tile=128, block_rows=16,
                              prefetch=2)),
  ]
  results = []
  for tag, kw in cases:
    try:
      kw = dict(kw)
      mt = kw.pop('mid_tile')
      ex = MidTiledPallasExecutor(st, shape, mid_tile=mt, **kw)
      args = list(ex.prepare(inputs))
      dt, _ = slope_time(ex.fn, args, chain_input_index(st), est,
                         reps=2)
      frac = (in_b + out_b) / dt / 1e9 / peak
      if want is None:
        want = reference.run(st, inputs)
      region = reference.output_valid_slices(st, shape)
      got = np.asarray(ex(inputs)['t0'])[region]
      nbad = int((got != want['t0'][region]).sum())
      results.append((frac, tag))
      log('>>> %-28s %.3f ms roofline=%.3f err=%d' %
          (tag, dt * 1e3, frac, nbad))
    except Exception as e:  # noqa: BLE001
      log('%-32s FAILED: %s' % (tag, str(e).splitlines()[0][:80]))
  if results:
    results.sort(reverse=True)
    log('BEST: %s %.3f' % (results[0][1], results[0][0]))


if __name__ == '__main__':
  main()
