"""Auto backend dispatch: pallas when VMEM fits, xla otherwise."""

import numpy as np

from soda_tpu import corpus
from soda_tpu.backend import get_executor, pallas_fits
from soda_tpu.backend.pallas_kernel import PallasExecutor
from soda_tpu.backend.xla import XlaExecutor
from soda_tpu.backend import reference

from checks import assert_close_reference


def test_small_grid_uses_pallas():
  stencil = corpus.build('jacobi2d')
  ex = get_executor(stencil, (24, 32), 'auto')
  assert isinstance(ex, PallasExecutor)


def test_huge_cross_section_falls_back_to_xla():
  stencil = corpus.build('jacobi3d')
  shape = (64, 512, 1024)  # 2 MB/row cross-section: no VMEM slab fits
  assert not pallas_fits(stencil, shape)
  ex = get_executor(stencil, shape, 'auto')
  assert isinstance(ex, XlaExecutor)


def test_fallback_is_correct():
  stencil = corpus.build('jacobi3d')
  shape = (16, 96, 160)
  ex = get_executor(stencil, shape, 'xla')
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True, 'xla-fallback')
