"""distribute optimization: coefficient factoring preserves semantics
within the reference THRESHOLD (floats reassociate)."""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference

from checks import assert_close_reference


def test_heat3d_op_count_drops():
  from soda_tpu.model.estimate import count_ops
  plain = corpus.build('heat3d')
  opt = corpus.build('heat3d', optimizations={'distribute': True})
  assert sum(count_ops(opt).values()) < sum(count_ops(plain).values())


@pytest.mark.parametrize('name', ['heat3d', 'jacobi2d', 'contrast'])
def test_distribute_preserves_semantics(name):
  plain = corpus.build(name)
  shape = corpus.TEST_DIMS[name]
  inputs = reference.make_test_inputs(plain, shape)
  want = reference.run(plain, inputs)
  opt = corpus.build(name, optimizations={'distribute': True})
  got = reference.run(opt, inputs)
  for out_name in plain.output_names:
    region = reference.output_valid_slices(plain, shape, out_name)
    assert_close_reference(got[out_name][region], want[out_name][region],
                           plain.symbol_table[out_name].is_float, name)
