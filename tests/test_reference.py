"""Oracle (NumPy reference executor) correctness tests.

Each test checks the executor against a hand-written NumPy
implementation of the kernel math under C semantics, mirroring how the
reference validates generated kernels against the scalar CPU loop
(frt/host.py:558-660): exact for ints, tolerance for floats.

Array-axis convention: axis 0 is the streaming dimension, the last axis
is DSL dimension 0 (see soda_tpu.backend.plan).
"""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference


def run_kernel(name, shape=None, **overrides):
  stencil = corpus.build(name, **overrides)
  shape = shape or corpus.TEST_DIMS[name]
  inputs = reference.make_test_inputs(stencil, shape)
  outs = reference.run(stencil, inputs)
  return stencil, inputs, outs


def test_blur_matches_manual():
  stencil, inputs, outs = run_kernel('blur')
  x = inputs['input'].astype(np.int32)
  h, w = x.shape
  # blur_x stores at (0,0) reading input(0, 0..2): shifts along the
  # streaming dim (axis 0); blur_y reads blur_x(0..2, 0): DSL dim 0
  # shifts, i.e. the minor axis.
  bx = (x[:-2, :] + x[1:-1, :] + x[2:, :]) // 3  # non-negative: // == C /
  by = (bx[:, :-2] + bx[:, 1:-1] + bx[:, 2:]) // 3
  got = outs['blur_y']
  region = reference.output_valid_slices(stencil, x.shape)
  assert region == (slice(0, h - 2), slice(0, w - 2))
  np.testing.assert_array_equal(got[region], by.astype(np.uint16))
  # outside the valid region the array is zero-filled
  assert not got[-2:, :].any() and not got[:, -2:].any()


def test_jacobi2d_iterate_two_sweeps():
  stencil, inputs, outs = run_kernel('jacobi2d')
  t1 = inputs['t1']

  def sweep(a):
    out = np.zeros_like(a)
    out[1:-1, 1:-1] = ((a[2:, 1:-1] + a[1:-1, 2:] + a[1:-1, 1:-1] +
                        a[:-2, 1:-1] + a[1:-1, :-2]) *
                       np.float32(0.2)).astype(np.float32)
    return out

  expected = sweep(sweep(t1))
  h, w = t1.shape
  region = reference.output_valid_slices(stencil, t1.shape)
  assert region == (slice(2, h - 2), slice(2, w - 2))
  np.testing.assert_allclose(outs['t0'][region], expected[region],
                             rtol=1e-6, atol=1e-6)


def test_erosion_min_windows():
  stencil, inputs, outs = run_kernel('erosion')
  x = inputs['input']
  h, w = x.shape
  # tmp stores at (0, 9) reading input(0, 0..18): a 19-tap min along the
  # streaming axis, centered; output stores at (9, 0) reading
  # tmp(0..18, 0): 19-tap min along the minor axis.
  col = np.full_like(x, np.iinfo(np.int16).max)
  for dj in range(19):
    col[9:h - 9, :] = np.minimum(col[9:h - 9, :], x[dj:h - 18 + dj, :])
  full = np.full_like(x, np.iinfo(np.int16).max)
  for di in range(19):
    full[9:h - 9, 9:w - 9] = np.minimum(full[9:h - 9, 9:w - 9],
                                        col[9:h - 9, di:w - 18 + di])
  region = reference.output_valid_slices(stencil, x.shape)
  assert region == (slice(9, h - 9), slice(9, w - 9))
  np.testing.assert_array_equal(outs['output'][region], full[region])


def test_sobel2d_uint16_wraparound():
  stencil, inputs, outs = run_kernel('sobel2d')
  img = inputs['img'].astype(np.int32)
  gx = np.zeros_like(img)
  gy = np.zeros_like(img)
  c = (slice(1, -1), slice(1, -1))
  # mag_x: img(i+1, j+dy) - img(i-1, j+dy); i = minor axis, j = axis 0
  gx[c] = ((img[:-2, 2:] - img[:-2, :-2]) +
           (img[1:-1, 2:] - img[1:-1, :-2]) * 3 +
           (img[2:, 2:] - img[2:, :-2]))
  # mag_y: img(i+dx, j+1) - img(i+dx, j-1)
  gy[c] = ((img[2:, :-2] - img[:-2, :-2]) +
           (img[2:, 1:-1] - img[:-2, 1:-1]) * 3 +
           (img[2:, 2:] - img[:-2, 2:]))
  # stored as int16 / uint16 with wrap-around, then widened again
  gx16 = gx.astype(np.int16).astype(np.int32)
  gy16 = gy.astype(np.uint16).astype(np.int32)
  mag = (65535 - (gx16 * gx16 + gy16 * gy16)).astype(np.uint16)
  region = reference.output_valid_slices(stencil, img.shape)
  np.testing.assert_array_equal(outs['mag'][region], mag[region])


def test_xcorr_truncating_division():
  # grid large enough that the int16 partial sums wrap negative
  stencil, inputs, outs = run_kernel('xcorr', shape=(96, 64))
  x = inputs['input'].astype(np.int32)
  h, w = x.shape
  t1 = np.zeros((h, w), np.int16)  # 19-tap sum along streaming axis
  for dj in range(19):
    t1[9:h - 9, :] = (t1[9:h - 9, :].astype(np.int32) +
                      x[dj:h - 18 + dj, :]).astype(np.int16)
  t2 = np.zeros((h, w), np.int16)  # then along the minor axis
  for di in range(19):
    t2[9:-9, 9:-9] = (t2[9:-9, 9:-9].astype(np.int32) +
                      t1[9:-9, di:w - 18 + di].astype(np.int32)
                      ).astype(np.int16)
  num = (t2[9:-9, 9:-9].astype(np.int32) - x[9:-9, 9:-9]) * x[9:-9, 9:-9]
  expected = np.trunc(num / 256).astype(np.int16)  # C trunc division
  region = reference.output_valid_slices(stencil, x.shape)
  assert (num < 0).any(), 'test should exercise negative dividends'
  np.testing.assert_array_equal(outs['tmp3'][region], expected)


@pytest.mark.parametrize('name', sorted(corpus.CORPUS))
def test_corpus_runs_and_is_nontrivial(name):
  stencil, inputs, outs = run_kernel(name)
  shape = next(iter(inputs.values())).shape
  region = reference.output_valid_slices(stencil, shape)
  for out_name, arr in outs.items():
    assert arr.shape == shape
    sub = arr[region]
    assert sub.size > 0
    assert np.isfinite(sub.astype(np.float64)).all()
    assert np.any(sub != 0), f'{name}:{out_name} is all zeros'
