"""Late-round-2 experiment 11: where erosion/xcorr's model residual goes.

The shift-aware op model (exp4 calibration) predicts erosion/xcorr at
~0.44-0.51 of roofline in rotate mode; production measures 0.25-0.31.
This experiment decomposes the gap:

  1. per-axis: a single 19-tap min pass (stream axis vs lane axis,
     greedy CR) — each measures ~41-48 slots/cell, i.e. ~7 slots per
     (shift + min) chain step vs the ~2.6/tap a flat 8-tap FOLD of one
     slab costs (see inline probe in the session log / CLAUDE.md).
     Conclusion: chained CR stages pay ~2x the per-tap price of flat
     folds (shape-shrinking value slices between stages).
  2. radix-4 / radix-8 overlap trees (idempotent min lets windows
     overlap: m4 covers [0..3], out = min(m4(0), m4(4), m4(8), m4(12),
     m4(15)) covers 19) — REFUTED: radix-4 measures 0.23-0.26 vs the
     greedy doubling chain's 0.31, radix-8 crashes Mosaic. Fewer
     stages do not beat more shifts; the doubling chain stands.
  3. native i16 min (2-per-lane packing would double throughput) —
     still crashes Mosaic (re-probe of the round-2 finding).

Run ON TPU: python experiments/exp11_chain_costs.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


HDR = """kernel: e
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 int16: input(2048, *)
"""

STREAM19 = HDR + 'output dram 1 int16: t(0, 9) = min(%s)\n' % ', '.join(
    'input(0, %d)' % j for j in range(19))
LANE19 = HDR + 'output dram 1 int16: t(9, 0) = min(%s)\n' % ', '.join(
    'input(%d, 0)' % i for i in range(19))
RADIX4 = HDR + """local int16: m4(0, 0) = min(input(0, 0), input(0, 1), input(0, 2), input(0, 3))
local int16: t(0, 9) = min(m4(0, 0), m4(0, 4), m4(0, 8), m4(0, 12), m4(0, 15))
local int16: l4(0, 0) = min(t(0, 0), t(1, 0), t(2, 0), t(3, 0))
output dram 1 int16: output(9, 0) = min(l4(0, 0), l4(4, 0), l4(8, 0), l4(12, 0), l4(15, 0))
"""


def main():
  import jax
  from bench import peak_bandwidth
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, stream_bytes

  peak = peak_bandwidth(jax.devices()[0])
  shape = (8192, 2048)
  cases = (
      ('stream-19 CR', STREAM19, {'computation-reuse': 'greedy'}),
      ('lane-19 CR', LANE19, {'computation-reuse': 'greedy'}),
      ('radix4 tree', RADIX4, {}),
  )
  for tag, src, ov in cases:
    st = api.build_stencil(src, optimizations=ov)
    ins = reference.make_test_inputs(st, shape)
    in_b, out_b = stream_bytes(st, shape)
    for mode in ('rotate', 'slice'):
      try:
        ex = PallasExecutor(st, shape, lane_shift=mode, block_rows=256)
        args = list(ex.prepare(ins))
        dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                           (in_b + out_b) / (peak * 1e9))
        frac = (in_b + out_b) / dt / 1e9 / peak
        slots = 3.9e12 * dt / (shape[0] * shape[1])
        log('%-14s %-6s: %.3f ms frac=%.3f (~%.0f slots/cell)' %
            (tag, mode, dt * 1e3, frac, slots))
      except Exception as e:  # noqa: BLE001
        first = (str(e).splitlines() or [repr(e)])[0]
        log('%s %s FAILED: %s' % (tag, mode, first[:110]))


if __name__ == '__main__':
  main()
