"""Offline campaign: dma_split x rolling fill x peel x prefetch (3-D).

dma_split issues each input-slab fill as several back-to-back
sub-DMAs on one semaphore slot (round 4, exp30/exp37). The intricate
interactions to cover: ragged row chunks (rows % split != 0) in every
rolling overlap class (second/mid/tail have three different row
counts), peel's statically-pruned boundary steps (static sub-range
offsets), prefetch > 2 (full-slab fills only), and mid tiling.

CPU-only (interpret mode). Run: python experiments/fuzz_dma_split.py [n]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

from soda_tpu.api import build_stencil  # noqa: E402
from soda_tpu.backend import reference  # noqa: E402
from soda_tpu.backend.pallas_kernel import PallasExecutor  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent /
                       'tests'))
from test_fuzz import gen_program  # noqa: E402
from checks import assert_close_reference  # noqa: E402


def main():
  n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
  rng = np.random.default_rng(20260819)
  fails = ran = skipped = 0
  for it in range(n_runs):
    program = gen_program(rng, 3)
    try:
      stencil = build_stencil(program)
    except Exception:  # noqa: BLE001 - generator rarely emits junk
      skipped += 1
      continue
    n_blocks = int(rng.integers(3, 8))
    block = int(rng.integers(3, 17))  # odd blocks force ragged chunks
    mid_ext = (16, 48)[int(rng.integers(0, 2))]
    shape = (n_blocks * block, mid_ext, 64)
    kw = dict(block_rows=block,
              dma_split=int(rng.integers(2, 5)))
    if rng.integers(0, 2):
      kw['mid_tile'] = 8
    mode = int(rng.integers(0, 3))
    if mode == 1:
      kw['stream_loop'] = (True, 'peel')[int(rng.integers(0, 2))]
    elif mode == 2:
      kw['prefetch'] = int(rng.integers(3, 5))
    if rng.integers(0, 2):
      kw.update(stage_mode='value', shift_mode='roll')
    try:
      inputs = reference.make_test_inputs(stencil, shape)
      want = reference.run(stencil, inputs)
    except Exception:  # noqa: BLE001 - undersized grid etc.
      skipped += 1
      continue
    try:
      ex = PallasExecutor(stencil, shape, **kw)
      got = ex(inputs)
      for out in stencil.output_names:
        region = reference.output_valid_slices(stencil, shape, out)
        assert_close_reference(
            np.asarray(got[out])[region], want[out][region],
            stencil.symbol_table[out].is_float, 'fuzz%d' % it)
      ran += 1
    except Exception as e:  # noqa: BLE001
      msg = str(e).splitlines()[0] if str(e) else repr(e)
      if 'VMEM' in msg or 'vmem' in msg or 'dma_split' in msg:
        skipped += 1  # legality gates raising cleanly is fine
        continue
      fails += 1
      print('FAIL it=%d kw=%s shape=%s\n%s\n%s' %
            (it, kw, shape, msg, program), flush=True)
  print('ran=%d fails=%d skipped=%d' % (ran, fails, skipped))
  return 1 if fails else 0


if __name__ == '__main__':
  sys.exit(main())
