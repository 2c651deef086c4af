"""Oracle (NumPy reference executor) correctness tests.

Each test checks the executor against a hand-written NumPy
implementation of the kernel math under C semantics, mirroring how the
reference validates generated kernels against the scalar CPU loop
(frt/host.py:558-660): exact for ints, tolerance for floats.
"""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference


def run_kernel(name, dims=None, **overrides):
  stencil = corpus.build(name, **overrides)
  dims = dims or corpus.TEST_DIMS[name]
  inputs = reference.make_test_inputs(stencil, dims)
  outs = reference.run(stencil, inputs)
  return stencil, inputs, outs


def test_blur_matches_manual():
  stencil, inputs, outs = run_kernel('blur')
  x = inputs['input'].astype(np.int32)
  dims = x.shape
  # blur_x(i, j) = (in(i, j) + in(i, j+1) + in(i, j+2)) / 3
  bx = (x[:, :-2] + x[:, 1:-1] + x[:, 2:]) // 3  # non-negative: // == C /
  # blur_y(i, j) = (bx(i, j) + bx(i+1, j) + bx(i+2, j)) / 3
  by = (bx[:-2, :] + bx[1:-1, :] + bx[2:, :]) // 3
  got = outs['blur_y']
  region = reference.output_valid_slices(stencil, dims)
  assert region == (slice(0, dims[0] - 2), slice(0, dims[1] - 2))
  np.testing.assert_array_equal(got[region], by.astype(np.uint16))
  # outside the valid region the array is zero-filled
  assert not got[:, -2:].any() and not got[-2:, :].any()


def test_jacobi2d_iterate_two_sweeps():
  stencil, inputs, outs = run_kernel('jacobi2d')
  t1 = inputs['t1']
  dims = t1.shape

  def sweep(a):
    out = np.zeros_like(a)
    out[1:-1, 1:-1] = ((a[1:-1, 2:] + a[2:, 1:-1] + a[1:-1, 1:-1] +
                        a[1:-1, :-2] + a[:-2, 1:-1]) *
                       np.float32(0.2)).astype(np.float32)
    return out

  expected = sweep(sweep(t1))
  region = reference.output_valid_slices(stencil, dims)
  assert region == (slice(2, dims[0] - 2), slice(2, dims[1] - 2))
  np.testing.assert_allclose(outs['t0'][region], expected[region],
                             rtol=1e-6, atol=1e-6)


def test_erosion_min_windows():
  stencil, inputs, outs = run_kernel('erosion')
  x = inputs['input']
  dims = x.shape
  # tmp(i, j) = min over input(i, j-9 .. j+9); output(i, j) = min over
  # tmp(i-9 .. i+9, j): store offsets shift the windows to be centered.
  col = np.full(dims, np.iinfo(np.int16).max, dtype=np.int16)
  for dj in range(19):
    col[:, 9:dims[1] - 9] = np.minimum(col[:, 9:dims[1] - 9],
                                       x[:, dj:dims[1] - 18 + dj])
  full = np.full(dims, np.iinfo(np.int16).max, dtype=np.int16)
  for di in range(19):
    full[9:dims[0] - 9, 9:dims[1] - 9] = np.minimum(
        full[9:dims[0] - 9, 9:dims[1] - 9],
        col[di:dims[0] - 18 + di, 9:dims[1] - 9])
  region = reference.output_valid_slices(stencil, dims)
  assert region == (slice(9, dims[0] - 9), slice(9, dims[1] - 9))
  np.testing.assert_array_equal(outs['output'][region], full[region])


def test_sobel2d_uint16_wraparound():
  stencil, inputs, outs = run_kernel('sobel2d')
  img = inputs['img'].astype(np.int32)
  dims = img.shape
  gx = np.zeros(dims, np.int32)
  gy = np.zeros(dims, np.int32)
  c = (slice(1, -1), slice(1, -1))
  gx[c] = ((img[2:, :-2] - img[:-2, :-2]) +
           (img[2:, 1:-1] - img[:-2, 1:-1]) * 3 +
           (img[2:, 2:] - img[:-2, 2:]))
  gy[c] = ((img[:-2, 2:] - img[:-2, :-2]) +
           (img[1:-1, 2:] - img[1:-1, :-2]) * 3 +
           (img[2:, 2:] - img[2:, :-2]))
  # stored as int16 / uint16 with wrap-around, then widened again
  gx16 = gx.astype(np.int16).astype(np.int32)
  gy16 = gy.astype(np.uint16).astype(np.int32)
  mag = (65535 - (gx16 * gx16 + gy16 * gy16)).astype(np.uint16)
  region = reference.output_valid_slices(stencil, dims)
  np.testing.assert_array_equal(outs['mag'][region], mag[region])


def test_xcorr_truncating_division():
  # grid large enough that the int16 partial sums wrap negative
  stencil, inputs, outs = run_kernel('xcorr', dims=(96, 64))
  x = inputs['input'].astype(np.int32)
  dims = x.shape
  t1 = np.zeros(dims, np.int16)
  for dj in range(19):
    t1[:, 9:dims[1] - 9] = (t1[:, 9:dims[1] - 9].astype(np.int32) +
                            x[:, dj:dims[1] - 18 + dj]).astype(np.int16)
  t2 = np.zeros(dims, np.int16)
  for di in range(19):
    t2[9:-9, 9:-9] = (t2[9:-9, 9:-9].astype(np.int32) +
                      t1[di:dims[0] - 18 + di, 9:-9].astype(
                          np.int32)).astype(np.int16)
  num = (t2[9:-9, 9:-9].astype(np.int32) - x[9:-9, 9:-9]) * x[9:-9, 9:-9]
  expected = np.trunc(num / 256).astype(np.int16)  # C trunc division
  region = reference.output_valid_slices(stencil, dims)
  assert (num < 0).any(), 'test should exercise negative dividends'
  np.testing.assert_array_equal(outs['tmp3'][region], expected)


@pytest.mark.parametrize('name', sorted(corpus.CORPUS))
def test_corpus_runs_and_is_nontrivial(name):
  stencil, inputs, outs = run_kernel(name)
  dims = next(iter(inputs.values())).shape
  region = reference.output_valid_slices(stencil, dims)
  for out_name, arr in outs.items():
    assert arr.shape == dims
    sub = arr[region]
    assert sub.size > 0
    assert np.isfinite(sub.astype(np.float64)).all()
    assert np.any(sub != 0), f'{name}:{out_name} is all zeros'
