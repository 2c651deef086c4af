"""Tool / aux-subsystem tests: calc-cost, compiled stats, cache."""

import json
import subprocess
import sys

import pathlib

import numpy as np

from soda_tpu import corpus

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
from soda_tpu.backend import reference
from soda_tpu.backend.pallas_kernel import PallasExecutor
from soda_tpu.model.compiled import compiled_stats


def test_calc_cost_cli():
  schedule = {'distance': 10,
              'left': {'distance': 1, 'left': 1, 'right': 1},
              'right': {'distance': 1, 'left': 1, 'right': 1}}
  r = subprocess.run(
      [sys.executable, '-m', 'soda_tpu.tools.calc_cost'],
      input=json.dumps({'schedule': schedule, 'aattrs': None}),
      capture_output=True, text=True, cwd=REPO,
      env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': REPO, 'HOME': '/root'})
  assert r.returncode == 0, r.stderr
  out = json.loads(r.stdout)
  # (x0 + x1) reused at offsets 0 and 10 -> 2 unique ops
  assert out['num_ops'] == 2
  assert out['total_distance'] >= 10


def test_compiled_stats_reports_memory():
  stencil = corpus.build('blur')
  shape = corpus.TEST_DIMS['blur']
  ex = PallasExecutor(stencil, shape)
  inputs = reference.make_test_inputs(stencil, shape)
  stats = compiled_stats(ex, inputs)
  assert stats.get('output_size_in_bytes') or \
      stats.get('memory_analysis_error') is None


def test_cache_enable(tmp_path):
  from soda_tpu import cache
  path = cache.enable(str(tmp_path / 'xla_cache'))
  import os
  assert os.path.isdir(path)


def test_perf_report_builds_from_committed_record():
  """PARITY's headline table is generated from the recorded artifact
  (bench_last_result.json), never an in-process run."""
  from soda_tpu.tools import perf_report
  report = perf_report.build_report()
  assert report['rows'], 'no kernels in the committed record'
  for row in report['rows']:
    # the model-honesty invariant, visible in the report itself
    assert row['roofline_frac'] <= row['ceiling'] * 1.03 + 1e-6
  assert 0.0 < report['geomean'] <= 1.2
