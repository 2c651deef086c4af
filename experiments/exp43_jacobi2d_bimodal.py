"""Round-5 experiment 43: explain jacobi2d bare-peel's bimodality.

VERDICT r4 #8: the bare-peel primary seed has recorded 0.200 ms (0.82
roofline) and 0.258 ms the SAME day across driver runs, and the round-4
record shipped 0.257 (0.637). Question: is the bimodality (a) remote
compile-fleet variance (two compiles of the same config produce
differently-scheduled binaries), or (b) run-to-run timing variance of
ONE binary? Method: compile the same config TWICE in one process
(two PallasExecutor instances = two remote compiles), time each 4x
interleaved, and dump XLA cost/memory stats per compile. Also time the
roll-b256 second seed for the in-process comparison point.

Run ON TPU (alone): python experiments/exp43_jacobi2d_bimodal.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  import numpy as np
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.model.compiled import compiled_stats
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  st = corpus.build('jacobi2d', tile_size=(2048, 0))
  shape = (8192, 2048)
  inputs = reference.make_test_inputs(st, shape)
  in_b, out_b = stream_bytes(st, shape)
  est = (in_b + out_b) / (peak * 1e9)
  chain = chain_input_index(st)

  cases = [
      ('peel #1', {'stream_loop': 'peel'}),
      ('peel #2', {'stream_loop': 'peel'}),
      ('roll b256', {'block_rows': 256, 'stage_mode': 'value',
                     'shift_mode': 'roll'}),
  ]
  exs, args = [], None
  for tag, cfg in cases:
    try:
      ex = PallasExecutor(st, shape, **cfg)
      if args is None:
        args = list(ex.prepare(inputs))
      stats = compiled_stats(ex, inputs)
      log('%-10s compiled: code=%s temp=%s flops=%s' %
          (tag, stats.get('generated_code_size_in_bytes'),
           stats.get('temp_size_in_bytes'), stats.get('flops')))
      exs.append((tag, ex))
    except Exception as e:  # noqa: BLE001
      log('%-10s COMPILE FAILED: %s' % (tag, str(e).splitlines()[0][:100]))

  # interleaved timing rounds: per-binary consistency vs cross-binary
  # spread tells compile variance from timing variance
  for rnd in range(4):
    for tag, ex in exs:
      dt, _ = slope_time(ex.fn, args, chain, est, reps=2)
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('round %d %-10s %.3f ms  frac %.3f' % (rnd, tag, dt * 1e3, frac))


if __name__ == '__main__':
  main()
