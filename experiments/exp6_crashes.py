"""Round-2 experiment 6: isolate value-mode Mosaic compile crashes.

tpu_validate: plain contrast (289-tap single stage) and plain xcorr
(i16 19-tap sums, masked wrap) crash the remote compiler under value
mode; both passed in round-1 vmem mode, and xcorr WITH CR compiles.
Bisect: stage mode x wrap style x kernel.

Run ON TPU: python experiments/exp6_crashes.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def try_case(tag, name, overrides, stage_mode, plain_wrap=False,
             shape=(512, 512)):
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference, semantics
  from soda_tpu.backend.pallas_kernel import PallasExecutor

  saved = semantics.wrap_promoted
  if plain_wrap:
    semantics.wrap_promoted = \
        lambda xp, v, dt, wf=False: semantics.wrap(xp, v, dt)
  try:
    stencil = corpus.build(name, tile_size=(512, 0), **overrides)
    ex = PallasExecutor(stencil, shape, stage_mode=stage_mode)
    inputs = reference.make_test_inputs(stencil, shape)
    out = ex(inputs)
    jax.block_until_ready(list(out.values()))
    want = reference.run(stencil, inputs)
    out_name = stencil.output_names[0]
    region = reference.output_valid_slices(stencil, shape, out_name)
    w = want[out_name][region]
    g = np.asarray(out[out_name])[region]
    if stencil.symbol_table[out_name].is_float:
      ok = np.allclose(w, g, rtol=1e-5, atol=1e-5)
    else:
      ok = np.array_equal(w, g)
    log('%-40s %s' % (tag, 'PASS' if ok else 'WRONG RESULT'))
  except Exception as e:  # noqa: BLE001
    log('%-40s FAILED: %s' % (tag, str(e).splitlines()[0][:110]))
  finally:
    semantics.wrap_promoted = saved


def main():
  import jax
  log('device: %s' % (jax.devices()[0],))
  cr = {'optimizations': {'computation-reuse': 'greedy'}}
  cases = (
      ('xcorr value', 'xcorr', {}, 'value', False),
      ('xcorr value plain-wrap', 'xcorr', {}, 'value', True),
      ('xcorr vmem', 'xcorr', {}, 'vmem', False),
      ('xcorr value +CR', 'xcorr', cr, 'value', False),
      ('contrast value', 'contrast', {}, 'value', False),
      ('contrast vmem', 'contrast', {}, 'vmem', False),
      ('contrast value +CR', 'contrast', cr, 'value', False),
  )
  for tag, name, ov, mode, plain in cases:
    try_case(tag, name, ov, mode, plain)


if __name__ == '__main__':
  main()
