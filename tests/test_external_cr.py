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
