"""The op-model ceiling must dominate every recorded measurement.

VERDICT r3 #6: a model quoted below already-measured results can't
gate anything (round 3 shipped PARITY rows saying "ceiling ~0.5" next
to measured 0.64). This pins the invariant: for every corpus kernel,
estimate()'s pure-roofline ceiling (model_roofline_frac, the
dispatch-free bound — the analog of the reference's cap formula,
model/xilinx.py:131-144, an upper bound by construction) is at least
the roofline fraction recorded in the committed last-hardware-run
record (bench_last_result.json, which BENCH_rNN.json reflects).
"""

import json
import os

import pytest

import bench as bench_mod
from soda_tpu import corpus
from soda_tpu.model import estimate as est

_RECORD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'bench_last_result.json')

# the record is measured on v5e (bench.py peak_bandwidth)
_V5E = {'name': 'v5e', 'hbm_gbps': 819.0, 'vpu_gflops': 3850.0}


def _record_details():
  if not os.path.exists(_RECORD):
    pytest.skip('no committed hardware record')
  with open(_RECORD) as f:
    rec = json.load(f)
  return rec.get('details', {})


@pytest.mark.parametrize('name,shape,overrides,seeds,meta',
                         [tuple(row[:4]) + (row[4] if len(row) > 4 else {},)
                          for row in bench_mod.CONFIGS])
def test_model_ceiling_dominates_measured(name, shape, overrides, seeds,
                                          meta):
  details = _record_details()
  entry = details.get(name)
  if not entry:
    pytest.skip('kernel not in the record')
  measured = float(entry['roofline_frac'])
  stencil = corpus.build(meta.get('kernel', name), **overrides)
  ceiling = est.ceiling_frac(stencil, shape, model_params=_V5E)
  # 3% slack: the record is a measurement (tunnel jitter, compile-fleet
  # variance); a measured value meaningfully ABOVE the model ceiling
  # means the model is stale and must be re-fit
  assert measured <= ceiling * 1.03 + 1e-6, (
      '%s: measured %.3f exceeds model ceiling %.3f — re-fit '
      'estimate.py (op costs or shift taxes are stale)' %
      (name, measured, ceiling))


def test_ceiling_prices_float_fma_pairs_once():
  """exp41 forced this: denoise3d measured 0.737 against a 0.696
  ceiling that priced its float mul+add pairs as two slots each.
  Mosaic contracts them into FMAs (docs/perf-log.md "Numerical
  findings"), so ceiling mode must price each contractible pair once
  — while integer kernels (no contraction guarantee) keep separate
  pricing."""
  from soda_tpu.backend.plan import make_plan
  # float kernel with many mul+add pairs
  st = corpus.build('denoise3d', tile_size=(128, 32, 0))
  plan = make_plan(st, 'full')
  ceil = est.op_model(st, plan, lanes=128, mode='ceiling')
  # contraction is per stage (an FMA can only fuse a mul+add living in
  # the same expression tree), so reconstruct the discount stage-wise
  fusable = sum(
      min(c['add'], c['mul'])
      for c in (est._stage_op_counts(s.tensor) for s in plan.stages))
  assert fusable > 0
  # reconstruct the un-fused arith pricing and check exactly `fusable`
  # slots were discounted
  arith_slots = sum(est.CEIL_OP_COST[k] * v
                    for k, v in ceil['arith'].items())
  shift_slots = sum(est.CEIL_SHIFT_COST[k] * v
                    for k, v in ceil['shifts'].items())
  assert ceil['slots_per_cell'] == pytest.approx(
      arith_slots + shift_slots - fusable)
  # integer kernel: no discount
  sti = corpus.build('erosion', tile_size=(2048, 0),
                     optimizations={'computation-reuse': 'greedy'})
  plani = make_plan(sti, 'full')
  ceili = est.op_model(sti, plani, lanes=2048, mode='ceiling')
  arith_i = sum(est.CEIL_OP_COST[k] * v
                for k, v in ceili['arith'].items())
  shift_i = sum(est.CEIL_SHIFT_COST[k] * v
                for k, v in ceili['shifts'].items())
  assert ceili['slots_per_cell'] == pytest.approx(arith_i + shift_i)
