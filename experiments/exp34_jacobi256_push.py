"""Round-4 experiment 34: push 256^3 jacobi3d past 0.55.

exp28 measured peel+roll at mid=128 as the first config past the 0.45
wall (0.512; plain peel 0.504). exp30's decomposition says the ~2us
per-step fixed cost is DMA-grant-chain latency that scales with block
size and is shaved by splitting the input DMA (split4 0.934 vs 0.870
on the pure-DMA replay) and shallow prefetch at small blocks (blk2
depth3 0.923). Remaining untried combos on the REAL kernel: peel+roll
across block sizes (exp28 used the default), mid=64 (more, smaller
steps — cheaper per exp30's block scaling), and depth-2 prefetch
without peel (peel+prefetch HTTP-500s).

Run ON TPU (alone): python experiments/exp34_jacobi256_push.py
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
      ('peel+roll mid128 (exp28 best)', dict(PEEL_ROLL, mid_tile=128)),
      ('peel+roll mid128 b16', dict(PEEL_ROLL, mid_tile=128,
                                    block_rows=16)),
      ('peel+roll mid128 b32', dict(PEEL_ROLL, mid_tile=128,
                                    block_rows=32)),
      ('peel+roll mid64', dict(PEEL_ROLL, mid_tile=64)),
      ('peel+roll mid64 b32', dict(PEEL_ROLL, mid_tile=64,
                                   block_rows=32)),
      ('roll prefetch2 mid128', {'stage_mode': 'value',
                                 'shift_mode': 'roll', 'mid_tile': 128,
                                 'prefetch': 2}),
      ('roll prefetch3 mid128', {'stage_mode': 'value',
                                 'shift_mode': 'roll', 'mid_tile': 128,
                                 'prefetch': 3}),
      ('peel+roll mid128 chunk8', dict(PEEL_ROLL, mid_tile=128,
                                       compute_chunk=8)),
  ]
  for tag, kw in cases:
    try:
      mt = kw.pop('mid_tile')
      ex = MidTiledPallasExecutor(st, shape, mid_tile=mt, **kw)
      args = list(ex.prepare(inputs))
      dt, _ = slope_time(ex.fn, args, chain_input_index(st), est,
                         reps=2)
      frac = (in_b + out_b) / dt / 1e9 / peak
      err = ''
      if want is None:
        want = reference.run(st, inputs)
      region = reference.output_valid_slices(st, shape)
      got = np.asarray(ex(inputs)['t0'])[region]
      nbad = int((got != want['t0'][region]).sum())
      err = 'err=%d' % nbad
      log('>>> %-32s %.3f ms roofline=%.3f %s' %
          (tag, dt * 1e3, frac, err))
    except Exception as e:  # noqa: BLE001
      log('%-36s FAILED: %s' % (tag, str(e).splitlines()[0][:80]))


if __name__ == '__main__':
  main()
