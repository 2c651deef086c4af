"""Autotune: probe-cache mechanics (CPU; hardware timing is stubbed —
interpret-mode Pallas is far too slow to time meaningfully).

The reference analog is the AutoBridge floorplan cache keyed by the
stencil text (cluster.py:104-160): an expensive deterministic probe
runs once per (stencil, shape, device) and later builds reuse it.
"""

import json

import numpy as np

from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.tools import autotune


def _fake_timer(times):
  def timer(stencil, shape, cfg, reps=2):
    key = (cfg.get('block_rows'), cfg.get('lane_shift'))
    if key not in times:
      raise RuntimeError('candidate rejected')
    return times[key]
  return timer


def test_tune_picks_fastest_and_caches(tmp_path, monkeypatch):
  cache = str(tmp_path / 'tune.json')
  stencil = corpus.build('jacobi2d')
  shape = (24, 32)
  # candidate set for a narrow 2-D grid: base block (24: the tiny
  # grid is a single block), 2x, 4x
  monkeypatch.setattr(
      autotune, '_time_config',
      _fake_timer({(24, None): 3e-3, (48, None): 1e-3, (96, None): 2e-3}))
  cfg = autotune.tune(stencil, shape, cache_path=cache)
  assert cfg == {'block_rows': 48}
  table = json.load(open(cache))
  (entry,) = table.values()
  assert entry['stencil'] == 'jacobi2d'
  assert entry['config'] == cfg
  # second call: pure cache hit (timer would now blow up)
  monkeypatch.setattr(autotune, '_time_config',
                      _fake_timer({}))
  assert autotune.tune(stencil, shape, cache_path=cache) == cfg


def test_tune_survives_all_candidates_failing(tmp_path, monkeypatch):
  cache = str(tmp_path / 'tune.json')
  stencil = corpus.build('jacobi2d')
  monkeypatch.setattr(autotune, '_time_config', _fake_timer({}))
  assert autotune.tune(stencil, (24, 32), cache_path=cache) == {}


def test_tuned_executor_matches_oracle(tmp_path, monkeypatch):
  cache = str(tmp_path / 'tune.json')
  stencil = corpus.build('blur')
  shape = corpus.TEST_DIMS['blur']
  monkeypatch.setattr(autotune, '_time_config',
                      _fake_timer({(40, None): 1e-3}))
  ex = autotune.tuned_executor(stencil, shape, cache_path=cache)
  assert ex.block_rows == 40
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert np.array_equal(np.asarray(got['blur_y'])[region],
                        want['blur_y'][region])


def test_candidates_for_oversized_3d_cross_section():
  # a cross-section beyond the VMEM budget must yield mid-tiling
  # candidates (including chunked evaluation) instead of crashing on
  # the estimator gate
  from soda_tpu import corpus
  from soda_tpu.tools.autotune import candidate_configs
  stencil = corpus.build('jacobi3d', tile_size=(512, 512, 0))
  cands = candidate_configs(stencil, (64, 512, 512))
  assert cands and all('mid_tile' in c for c in cands)
  assert any('compute_chunk' in c for c in cands)
  # stream_loop probes (exp27/exp28): one kernel invocation over the
  # whole many-step grid, both plain and boundary-peeled
  assert any(c.get('stream_loop') == 'peel' for c in cands)
  assert any(c.get('stream_loop') is True for c in cands)


def test_candidates_include_peel_for_many_step_2d():
  # many cheap grid steps: the generic candidate list adds the
  # stream_loop='peel' probe (the ~2us/step fixed-cost attack); a
  # single-block grid must NOT get it (stream_loop is a no-op there)
  from soda_tpu import corpus
  from soda_tpu.tools.autotune import candidate_configs
  stencil = corpus.build('blur', tile_size=(2048, 0))
  many = candidate_configs(stencil, (8192, 2048))
  assert any(c.get('stream_loop') == 'peel' for c in many)
  few = candidate_configs(stencil, (64, 256))
  assert not any('stream_loop' in c for c in few)
