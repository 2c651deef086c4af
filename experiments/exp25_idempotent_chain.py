"""Round-3 experiment 25: idempotent-window doubling chains on hardware.

The new idempotent-window CR path folds erosion's two 19-tap min
windows in 5 chained ops each (overlapping doubling: distances
1,2,4,8,3) instead of the exact-cover optimum's 6 (12 total).  With
the chained-stage tax at ~4-7 slots/step (exp24), 12 -> 10 stages
should be worth ~15% on a stage-tax-bound kernel.

Seed to beat: erosion 0.405 (roll+transposed hybrid, block 256).

Run ON TPU (alone): python experiments/exp25_idempotent_chain.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


CASES = (
    # (tag, opt overrides, executor opts, seed frac)
    ('ero-idem-256', {},
     {'block_rows': 256, 'transpose_lanes': 'on'}, 0.405),
    ('ero-idem-128', {},
     {'block_rows': 128, 'transpose_lanes': 'on'}, 0.405),
    ('ero-exact-256', {'idempotent-window': 'no'},
     {'block_rows': 256, 'transpose_lanes': 'on'}, 0.405),
    ('ero-idem-notr-256', {},
     {'block_rows': 256, 'transpose_lanes': 'off'}, 0.405),
)


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (8192, 2048)

  for tag, opt_ov, opts, seed in CASES:
    try:
      stencil = corpus.build(
          'erosion', tile_size=(2048, 0),
          optimizations={'computation-reuse': 'greedy', **opt_ov})
      ex = PallasExecutor(stencil, shape, stage_mode='value',
                          shift_mode='roll', **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> %-18s %.3f  (seed %.2f, %+0.1f%%)  %.3f ms c=%.0fs' %
          (tag, frac, seed, 100 * (frac / seed - 1), dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('%-18s FAILED: %s' % (tag, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  main()
