"""Real-hardware corpus validation sweep.

Runs every corpus kernel's fused Pallas executor on the attached TPU
and compares against the NumPy oracle — the hardware analog of the
reference's software gate (tests/test-cpp-host.sh runs all 11 kernels
and checks them against the scalar reference). Prints a PASS/FAIL
table and exits non-zero on any failure.

Usage: python -m soda_tpu.tools.tpu_validate [--shape-scale N]
"""

from __future__ import annotations

import sys

import numpy as np

SHAPES = {
    'blur': (512, 2048),
    'contrast': (512, 512),
    'denoise2d': (512, 512),
    'denoise3d': (128, 32, 128),
    'erosion': (512, 512),
    'heat3d': (256, 32, 128),
    'jacobi2d': (512, 512),
    'jacobi3d': (256, 32, 128),
    'seidel2d': (512, 512),
    'sobel2d': (512, 512),
    'xcorr': (512, 512),
}

TILE = {
    'blur': (2048, 0), 'contrast': (512, 0), 'erosion': (512, 0),
    'xcorr': (512, 0), 'heat3d': (128, 32, 0), 'jacobi3d': (128, 32, 0),
    'denoise3d': (128, 32, 0), 'jacobi2d': (512, 0),
    'seidel2d': (512, 0), 'sobel2d': (512, 0), 'denoise2d': (512, 0),
}

THRESHOLD = 1e-5


def check(name, variants=()):
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  overrides = dict(variants)
  if name in TILE:
    overrides.setdefault('tile_size', TILE[name])
  stencil = corpus.build(name, **overrides)
  shape = SHAPES[name]
  inputs = reference.make_test_inputs(stencil, shape)
  params = reference.make_test_params(stencil)
  want = reference.run(stencil, inputs, params)
  ex = PallasExecutor(stencil, shape)
  got = ex(inputs, params)
  worst = 0.0
  bad_total = 0
  for out_name in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out_name)
    g = np.asarray(got[out_name])[region]
    w_ = want[out_name][region]
    if stencil.symbol_table[out_name].is_float:
      d2 = (g.astype(np.float64) - w_.astype(np.float64)) ** 2
      w2 = w_.astype(np.float64) ** 2
      bad = (d2 > THRESHOLD) & (d2 > THRESHOLD * w2)
      worst = max(worst, float(np.sqrt(d2.max())))
    else:
      bad = g != w_
      worst = max(worst, float(np.abs(
          g.astype(np.int64) - w_.astype(np.int64)).max()))
    bad_total += int(bad.sum())
  return bad_total, worst


def main() -> int:
  import jax
  from soda_tpu import corpus
  print('device: %s backend=%s' % (jax.devices()[0],
                                   jax.default_backend()))
  failures = 0
  rows = []
  for name in sorted(corpus.CORPUS):
    variants = {}
    try:
      bad, worst = check(name, variants)
      status = 'PASS' if bad == 0 else 'FAIL(%d bad, worst %.3g)' % (
          bad, worst)
      failures += bad != 0
    except Exception as e:  # noqa: BLE001 - report, keep sweeping
      status = 'ERROR: %s' % str(e)[:90].replace('\n', ' ')
      failures += 1
    rows.append((name, status))
    print('%-12s %s' % (name, status), flush=True)
  print('%d/%d kernels pass' % (len(rows) - failures, len(rows)))
  return 1 if failures else 0


if __name__ == '__main__':
  sys.exit(main())
