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


@pytest.mark.parametrize('name,shape,overrides,seeds', bench_mod.CONFIGS)
def test_model_ceiling_dominates_measured(name, shape, overrides, seeds):
  details = _record_details()
  entry = details.get(name)
  if not entry:
    pytest.skip('kernel not in the record')
  measured = float(entry['roofline_frac'])
  stencil = corpus.build(name, **overrides)
  ceiling = est.ceiling_frac(stencil, shape, model_params=_V5E)
  # 3% slack: the record is a measurement (tunnel jitter, compile-fleet
  # variance); a measured value meaningfully ABOVE the model ceiling
  # means the model is stale and must be re-fit
  assert measured <= ceiling * 1.03 + 1e-6, (
      '%s: measured %.3f exceeds model ceiling %.3f — re-fit '
      'estimate.py (op costs or shift taxes are stale)' %
      (name, measured, ceiling))
