"""Autotune: hardware-probe cache mechanics (interpret mode on CPU).

The reference analog is the AutoBridge floorplan cache keyed by the
stencil text (cluster.py:104-160): an expensive deterministic probe
runs once per (stencil, shape, device) and later builds reuse it.
"""

import json

from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.tools import autotune


def test_tune_probes_and_caches(tmp_path):
  cache = str(tmp_path / 'tune.json')
  stencil = corpus.build('jacobi2d')
  shape = (24, 32)
  cfg = autotune.tune(stencil, shape, cache_path=cache)
  assert 'block_rows' in cfg
  table = json.load(open(cache))
  assert len(table) == 1
  (entry,) = table.values()
  assert entry['stencil'] == 'jacobi2d'
  assert entry['config'] == cfg
  # second call hits the cache (mutate the stored config to prove it)
  key = next(iter(table))
  table[key]['config'] = {'block_rows': 8}
  json.dump(table, open(cache, 'w'))
  assert autotune.tune(stencil, shape, cache_path=cache) == \
      {'block_rows': 8}


def test_tuned_executor_matches_oracle(tmp_path):
  import numpy as np
  cache = str(tmp_path / 'tune.json')
  stencil = corpus.build('blur')
  shape = corpus.TEST_DIMS['blur']
  ex = autotune.tuned_executor(stencil, shape, cache_path=cache)
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert np.array_equal(np.asarray(got['blur_y'])[region],
                        want['blur_y'][region])
