"""Round-5 experiment 46: shifted-load CSE in roll mode (the exp45 gap).

exp45 put denoise2d's honest achievable at ~0.93 with the gap to the
0.65 record labeled "stage-materialization overhead". Reading the
executor shows a more concrete suspect: value/roll-mode loads were
never memoized, so a parent re-read at the same offset by a LATER
stage re-pays the full in-register rotate — denoise2d's output stage
re-rolls u at all 4 diff offsets (4 x ~5-7 slots, exp24 prices ~= the
whole 25-slot/cell gap), denoise3d at all 6. exp45's synthetic assumed
"one roll per distinct (tensor, offset)" — an assumption the executor
did not actually satisfy until now.

A/B in ONE process via pallas_kernel._ROLL_CSE (trace-time flag):
every roll/hybrid bench seed measured with the memo off then on.
Expect: denoise2d/3d win big; single-reader kernels (jacobi/heat)
neutral; erosion/xcorr (CR reuse-var chains) measured to find out.

VERDICT (2026-08-21, v5e): memo REFUTED as a default. Where duplicate
loads exist the memo is timing-NEUTRAL (denoise2d 0.882 -> 0.872,
xcorr 0.392 -> 0.387, seidel2d 0.670 -> 0.670) — Mosaic already CSEs
the byte-identical rotates — and on denoise3d peel+b16 it LOSES 23%
(0.780 -> 0.600: the memo pins every rolled slab live across the
whole stage sequence, which at 16-row blocks wrecks Mosaic's
scheduling). Zero-duplicate kernels bracket the noise band (jacobi2d
+1.8%, heat3d +3.7% on identical traces). _ROLL_CSE defaults False;
the duplication tally feeds estimate.op_model's global roll dedup.
Side discovery: this fleet day measures denoise2d roll-b128 at 0.882
roofline (record 0.651) and heat3d 0.925 — fleet state, same source.

Run ON TPU (alone): python experiments/exp46_roll_cse.py [kernels...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


ROLL = {'stage_mode': 'value', 'shift_mode': 'roll'}
HYB = dict(ROLL, transpose_lanes='on')

# bench-seed configs (bench.py CONFIGS primaries as of round 5)
CASES = {
    'denoise2d': dict(ROLL, block_rows=128),
    'denoise3d': dict(ROLL, block_rows=16, stream_loop='peel'),
    'jacobi2d': dict(ROLL, block_rows=256),
    'heat3d': dict(ROLL, block_rows=64),
    'seidel2d': dict(ROLL, block_rows=256),
    'erosion': dict(HYB, block_rows=256, lane_shift='rotate'),
    'xcorr': dict(HYB, block_rows=352, lane_shift='rotate'),
}


def main():
  import jax
  import bench as bench_mod
  from experiments.exp33_big_blocks import measure
  from soda_tpu import corpus
  from soda_tpu.backend import pallas_kernel
  from soda_tpu.profiling import peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  names = sys.argv[1:] or list(CASES)
  for row in bench_mod.CONFIGS:
    name, shape, overrides = row[0], row[1], row[2]
    if name not in names or name not in CASES:
      continue
    stencil = corpus.build(name, **overrides)
    cfg = CASES[name]
    row = {}
    for cse in (False, True):
      pallas_kernel._ROLL_CSE = cse
      try:
        dt, f = measure(stencil, shape, cfg, peak)
        row[cse] = (dt, f)
        log('%-10s cse=%-5s %.3f ms frac=%.3f' % (name, cse, dt * 1e3, f))
      except Exception as e:  # noqa: BLE001
        log('%-10s cse=%-5s FAILED %s' %
            (name, cse, str(e).splitlines()[0][:70]))
    pallas_kernel._ROLL_CSE = True
    if len(row) == 2:
      gain = row[False][0] / row[True][0]
      log('%-10s CSE speedup %.3fx (%.3f -> %.3f frac)' %
          (name, gain, row[False][1], row[True][1]))


if __name__ == '__main__':
  main()
