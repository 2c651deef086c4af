"""Round-3 experiment 15: contrast symmetric folding (VERDICT item 6).

Rewrites contrast's 196-term weighted sum as: one group-sum stage per
DISTINCT coefficient value (all offsets sharing that coefficient),
then a weighted total whose reads are all at offset (0,0) — no shifted
reads in the consuming stage. Measures plain / +CR variants against
the round-2 best (0.098).

CPU check: python experiments/exp15_contrast_sym.py check
TPU run:   python experiments/exp15_contrast_sym.py [measure]
"""

import collections
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def sym_source():
  from soda_tpu.corpus import _CONTRAST_HALF_ROWS
  coeffs = {}
  for y, half in enumerate(_CONTRAST_HALF_ROWS):
    for dx, c in enumerate(half):
      for xx in {8 + dx, 8 - dx}:
        for yy in {y, 16 - y}:
          coeffs[(xx, yy)] = c
  coeffs.pop((14, 6), None)  # reference table asymmetry, corpus.py
  groups = collections.defaultdict(list)
  for (x, y), c in sorted(coeffs.items()):
    groups[c].append((x, y))
  lines = ['kernel: contrast', 'burst width: 64', 'unroll factor: 4',
           'iterate: 1', 'border: ignore', 'cluster: none',
           'input dram 0 float: input(64, *)']
  terms = []
  # g stores at (0, 0) with the raw tap offsets and the output reads
  # every g at (0, 0): net input offsets compose to exactly the base
  # program's, so the valid regions coincide
  for k, (c, offs) in enumerate(sorted(groups.items())):
    name = 'g%d' % k
    taps = ' + '.join('input(%d, %d)' % (x, y) for x, y in offs)
    lines.append('local float: %s(0, 0) = %s' % (name, taps))
    terms.append('%s(0, 0) * %d' % (name, c))
  lines.append('output dram 1 float: output(0, 0) = ' + ' + '.join(terms))
  return '\n'.join(lines), len(groups)


def check():
  import jax
  jax.config.update('jax_platforms', 'cpu')
  from soda_tpu import corpus
  from soda_tpu.api import build_stencil
  from soda_tpu.backend import reference

  src, n_groups = sym_source()
  log('%d coefficient groups' % n_groups)
  base = corpus.build('contrast', tile_size=(64, 0))
  sym = build_stencil(src, tile_size=(64, 0))
  shape = (48, 64)
  inputs = reference.make_test_inputs(base, shape)
  want = reference.run(base, inputs)
  got = reference.run(sym, inputs)
  rb = reference.output_valid_slices(base, shape, 'output')
  rs = reference.output_valid_slices(sym, shape, 'output')
  assert rb == rs, (rb, rs)
  # grouped summation reassociates the +-100-coefficient cancelling
  # sums; divergence is the same class as CR/rebalance/separable and
  # judged at the contrast validate threshold (1e-3, tools/tpu_validate)
  np.testing.assert_allclose(got['output'][rs], want['output'][rb],
                             rtol=1e-3, atol=1e-3)
  log('sym contrast matches the corpus oracle (1e-3)')


def measure():
  import jax
  from soda_tpu.api import build_stencil
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (32768, 512)
  src, n_groups = sym_source()
  log('%d coefficient groups' % n_groups)
  for tag, overrides, opts in (
      # exp12: wide shifted add-chains now legalize in value mode
      ('sym plain value', {}, {'stage_mode': 'value',
                               'block_rows': 128}),
      ('sym +CR greedy value', {'optimizations': {'computation-reuse':
                                                  'greedy'}},
       {'stage_mode': 'value', 'block_rows': 128}),
      ('sym +CR native value', {'optimizations': {'computation-reuse':
                                                  'yes'}},
       {'stage_mode': 'value', 'block_rows': 128}),
      ('sym +CR greedy value b256',
       {'optimizations': {'computation-reuse': 'greedy'}},
       {'stage_mode': 'value', 'block_rows': 256}),
  ):
    try:
      stencil = build_stencil(src, tile_size=(512, 0), **overrides)
      ex = PallasExecutor(stencil, shape, **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> contrast %-16s %.3f (%.3f ms, compile %.0fs)' %
          (tag, frac, dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('contrast %-16s FAILED: %s' %
          (tag, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  if 'check' in sys.argv[1:]:
    check()
  else:
    measure()
