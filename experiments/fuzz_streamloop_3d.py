"""Offline campaign: stream_loop x mid-tiling x rolling fill (3-D).

The prior stream_loop campaigns (VALIDATION.md) drew mostly 2-D
programs; this one forces the intricate 3-D interactions: the rolling
slab fill's overlap classes under peel's statically-pruned steps, mid
tiling's (jm, i) fori_loop nesting, and tiny grids where the peeled
boundary steps cover most of the grid (n = 4, 5).

CPU-only (interpret mode). Run: python experiments/fuzz_streamloop_3d.py [n]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

from soda_tpu.api import build_stencil  # noqa: E402
from soda_tpu.backend import reference  # noqa: E402
from soda_tpu import utils  # noqa: E402
from soda_tpu.backend.pallas_kernel import PallasExecutor  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent /
                       'tests'))
from test_fuzz import gen_program  # noqa: E402
from checks import assert_close_reference  # noqa: E402


def main():
  n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
  rng = np.random.default_rng(20260817)
  fails = ran = skipped = 0
  for it in range(n_runs):
    program = gen_program(rng, 3)
    try:
      stencil = build_stencil(program)
    except Exception:  # noqa: BLE001 - generator rarely emits junk
      skipped += 1
      continue
    # shapes chosen so the stream grid lands on peel's edge cases
    # (n = 4, 5) as well as long grids; mid axis sometimes tiled
    n_blocks = int(rng.integers(4, 9))
    block = 8 * int(rng.integers(1, 3))
    # mid extent varies so grid_m crosses the peel threshold (<=4
    # unrolls static jm; >4 runs the fori_loop-over-jm path where jm
    # is traced but the peeled stream steps keep static i)
    mid_ext = (16, 48, 64)[int(rng.integers(0, 3))]
    shape = (n_blocks * block, mid_ext, 64)
    kw = dict(block_rows=block)
    if rng.integers(0, 2):
      kw['mid_tile'] = 8
    kw['stream_loop'] = (True, 'peel')[int(rng.integers(0, 2))]
    if rng.integers(0, 2):
      kw.update(stage_mode='value', shift_mode='roll')
    if rng.integers(0, 2):
      # deep prefetch (disables the rolling fill; exercises the
      # warm-up fills and the look-ahead wrap across mid tiles)
      kw['prefetch'] = int(rng.integers(3, 5))
    try:
      inputs = reference.make_test_inputs(stencil, shape)
      try:
        want = reference.run(stencil, inputs)
      except utils.InputError:
        skipped += 1  # window cannot fit the grid: generator artifact
        continue
      region = reference.output_valid_slices(stencil, shape)
      ex = PallasExecutor(stencil, shape, interpret=True, **kw)
      got = ex(inputs)
    except Exception as e:  # noqa: BLE001
      msg = str(e).splitlines()[0] if str(e) else type(e).__name__
      if ('InputError' in type(e).__name__ or 'skip' in msg.lower() or
          'VMEM' in msg):
        skipped += 1
        continue
      print('[%d] BUILD FAIL %s kw=%s\n%s' % (it, msg[:160], kw, program),
            flush=True)
      fails += 1
      continue
    ran += 1
    for out in stencil.output_names:
      try:
        assert_close_reference(
            np.asarray(got[out])[region], want[out][region],
            stencil.symbol_table[out].is_float,
            context='fuzz3d[%d].%s' % (it, out))
      except AssertionError as e:
        print('[%d] MISMATCH kw=%s shape=%s\n%s\n%s' %
              (it, kw, shape, str(e).splitlines()[0][:200], program),
              flush=True)
        fails += 1
    if (it + 1) % 25 == 0:
      print('progress %d/%d ran=%d skipped=%d fails=%d' %
            (it + 1, n_runs, ran, skipped, fails), flush=True)
  print('DONE ran=%d skipped=%d fails=%d' % (ran, skipped, fails),
        flush=True)
  return 1 if fails else 0


if __name__ == '__main__':
  sys.exit(main())
