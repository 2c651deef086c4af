"""External (C++) computation-reuse scheduler tests.

Mirrors the reference's TestExternalSchedules (skipped there unless
soda-cr is on PATH; here the binary is built from native/ on demand).
"""

import pathlib
import subprocess

import pytest

from soda_tpu.optimization import cr_schedules as cr

NATIVE = pathlib.Path(__file__).resolve().parent.parent / 'native'


@pytest.fixture(scope='session')
def cr_binary():
  binary = NATIVE / 'build' / 'soda-tpu-cr'
  if not binary.exists():
    try:
      subprocess.run(['make', '-C', str(NATIVE)], check=True,
                     capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
      pytest.skip('cannot build native scheduler: %r' % e)
  assert binary.exists()
  return str(binary)


def test_found_on_search_path(cr_binary):
  assert cr.find_external_cr() == cr_binary


def test_3x3_cr(cr_binary):
  rattrs = (0, 1, 2, 10, 11, 12, 20, 21, 22)
  aattrs = (1, 1, 1, 1, 2, 1, 1, 1, 1)
  schedule = cr.ExternalSchedules(rattrs, aattrs).best
  assert schedule.num_ops == 5  # reference baseline (test_3x3_cr)


def test_3x3_ones(cr_binary):
  rattrs = (0, 1, 2, 10, 11, 12, 20, 21, 22)
  schedule = cr.ExternalSchedules(rattrs, None).best
  assert schedule.num_ops == 4


def test_jacobi2d(cr_binary):
  schedule = cr.ExternalSchedules((1, 10, 11, 12, 21), None).best
  assert schedule.num_ops == 3


@pytest.mark.slow
def test_16x16(cr_binary):
  rattrs = tuple(y * 31 + x for y in range(16) for x in range(16))
  lin = cr.Linearizer([(x, y) for y in range(16) for x in range(16)])
  schedule = cr.ExternalSchedules(rattrs, None, lin).best
  assert schedule.num_ops == 8


# -- reference soda-cr protocol: re-sorted rattrs anchor the tree --------------

# A stub scheduler speaking the REFERENCE soda-cr dialect
# (computation_reuse.py:1707): it echoes `rattrs` back RE-SORTED
# (descending here) and the schedule tree is anchored at the returned
# rattrs[0], not at the caller's smallest rattr. Handles exactly the
# 2x2-rectangle operand sets the tests feed it, pairing the two rows.
_STUB = r'''#!/usr/bin/env python3
import json, sys
req = json.load(sys.stdin)
rattrs = sorted(req['rattrs'])
a, b = rattrs[1] - rattrs[0], rattrs[2] - rattrs[0]
assert rattrs == [rattrs[0], rattrs[0] + a, rattrs[0] + b,
                  rattrs[0] + a + b], 'stub only handles 2x2 rectangles'
assert len(set(req['aattrs'])) == 1, 'stub only handles uniform aattrs'
leaf = req['aattrs'][0]
pair = {'left': leaf, 'right': leaf, 'distance': -a}
json.dump({'rattrs': rattrs[::-1],
           'left': pair, 'right': pair, 'distance': -b}, sys.stdout)
'''


@pytest.fixture
def stub_cr(tmp_path, monkeypatch):
  stub = tmp_path / 'stub-soda-cr'
  stub.write_text(_STUB)
  stub.chmod(0o755)
  monkeypatch.setattr(cr.ExternalSchedules, 'BINARIES', ('stub-soda-cr',))
  monkeypatch.setenv('PATH', str(tmp_path), prepend=':')
  return stub


def test_resorted_rattrs_anchor_schedule(stub_cr):
  """The returned tree must be rooted at the RETURNED rattrs[0]."""
  schedule = cr.ExternalSchedules((0, 1, 10, 11), None).best
  assert schedule.base == 11  # stub re-sorts descending
  assert schedule.num_ops == 2  # one shared pair + the combine
  # leaves sit at base-relative offsets; made absolute they must
  # reproduce the original operand set
  offsets = sorted(schedule.base + off
                   for off, _ in schedule.attrs_with_offset(0))
  assert offsets == [0, 1, 10, 11]


def test_resorted_rattrs_lower_semantics(stub_cr):
  """End-to-end: the CR pass through the re-sorting external scheduler
  produces the same numbers as the plain stencil."""
  import numpy as np
  from soda_tpu.api import build_stencil
  from soda_tpu.backend import reference

  source = '\n'.join([
      'kernel: extprot',
      'burst width: 64',
      'unroll factor: 1',
      'iterate: 1',
      'border: ignore',
      'cluster: none',
      'input uint16: x(64, *)',
      'output uint16: y(0, 0) = '
      'x(0, 0) + x(1, 0) + x(0, 1) + x(1, 1)',
  ])
  plain = build_stencil(source)
  rewritten = build_stencil(
      source, optimizations={'computation-reuse': 'external'})
  assert any(n.startswith('cr_var_') for n in rewritten.local_names)
  shape = (32, 64)
  inputs = reference.make_test_inputs(plain, shape)
  want = reference.run(plain, inputs)
  got = reference.run(rewritten, inputs)
  region = reference.output_valid_slices(rewritten, shape, 'y')
  assert np.array_equal(want['y'][region], got['y'][region])
