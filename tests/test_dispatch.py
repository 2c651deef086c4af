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


def test_huge_cross_section_uses_mid_tiling():
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('jacobi3d')
  shape = (64, 512, 1024)  # 2 MB/row cross-section: no VMEM slab fits
  assert not pallas_fits(stencil, shape)
  ex = get_executor(stencil, shape, 'auto')
  assert isinstance(ex, MidTiledPallasExecutor)
  assert ex.mid_tile < 512


def test_mid_tiled_matches_oracle():
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('heat3d')
  shape = (16, 48, 128)
  ex = MidTiledPallasExecutor(stencil, shape, mid_tile=16)  # force tiles
  assert ex.n_tiles == 3
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['out'])[region],
                         want['out'][region], True, 'mid-tiled')


def test_mid_tiled_ragged_tail():
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('jacobi3d')
  shape = (16, 40, 128)  # 40 = 2x16 + 8 ragged
  ex = MidTiledPallasExecutor(stencil, shape, mid_tile=16)
  inputs = reference.make_test_inputs(stencil, inputs_shape := shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True, 'mid-ragged')


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
