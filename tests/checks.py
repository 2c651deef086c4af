"""Shared comparison helper implementing the reference's pass criterion.

Integer outputs: bit-exact. Float outputs: an element fails only if the
squared error exceeds THRESHOLD both absolutely and relative to the
squared reference value — the exact check of the generated self-test
(reference frt/host.py:633-657, THRESHOLD default 1e-5,
env-overridable there; fixed here).
"""

import numpy as np

THRESHOLD = 1e-5


def assert_close_reference(got, want, is_float: bool, context: str = ''):
  got = np.asarray(got)
  want = np.asarray(want)
  assert got.shape == want.shape, (got.shape, want.shape)
  if not is_float:
    np.testing.assert_array_equal(got, want, err_msg=context)
    return
  d2 = (got.astype(np.float64) - want.astype(np.float64)) ** 2
  w2 = want.astype(np.float64) ** 2
  bad = (d2 > THRESHOLD) & (d2 > THRESHOLD * w2)
  if bad.any():
    idx = np.argwhere(bad)[0]
    raise AssertionError(
        '%s: %d/%d elements fail reference THRESHOLD; first at %s: '
        'got %r want %r' % (context, int(bad.sum()), bad.size, tuple(idx),
                            got[tuple(idx)], want[tuple(idx)]))
