"""Round-4 experiment 39: 256^3 jacobi3d — retry the crashed combos.

exp34 confirmed peel+roll at 0.512-0.520 (mid 64 == mid 128) but every
peel x {prefetch, smaller block} combo HTTP-500'd on that fleet
stretch, leaving the named gap to 0.55 unmeasured. The fleet updates
between sessions (exp33's b512 unlock appeared the same way); retry
the joint combos plus the never-tried mid=32 and split-on-top-of-peel
points, one process, bit-exact check on the winner.

Run ON TPU (alone): python experiments/exp39_jacobi256_retry.py
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
      ('peel+roll mid64 (seed)', dict(PEEL_ROLL, mid_tile=64)),
      ('peel+roll mid64 prefetch2', dict(PEEL_ROLL, mid_tile=64,
                                         prefetch=2)),
      ('peel+roll mid64 prefetch3', dict(PEEL_ROLL, mid_tile=64,
                                         prefetch=3)),
      ('peel+roll mid128 prefetch2', dict(PEEL_ROLL, mid_tile=128,
                                          prefetch=2)),
      ('peel+roll mid64 b16', dict(PEEL_ROLL, mid_tile=64,
                                   block_rows=16)),
      ('peel+roll mid64 b8', dict(PEEL_ROLL, mid_tile=64,
                                  block_rows=8)),
      ('peel+roll mid32', dict(PEEL_ROLL, mid_tile=32)),
      ('peel+roll mid64 split2 pf2', dict(PEEL_ROLL, mid_tile=64,
                                          dma_split=2, prefetch=2)),
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
      log('>>> %-32s %.3f ms roofline=%.3f err=%d' %
          (tag, dt * 1e3, frac, nbad))
    except Exception as e:  # noqa: BLE001
      log('%-36s FAILED: %s' % (tag, str(e).splitlines()[0][:80]))
  if results:
    results.sort(reverse=True)
    log('BEST: %s %.3f' % (results[0][1], results[0][0]))


if __name__ == '__main__':
  main()
