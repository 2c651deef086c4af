"""XLA backend vs NumPy oracle parity across the full corpus.

Mirrors the reference's software correctness gate
(tests/test-cpp-host.sh): every corpus kernel, integer results
bit-exact, float results within the reference THRESHOLD (1e-5 rel+abs,
frt/host.py:633-657). Also re-runs a subset under cluster=coarse, the
analog of tests/test-cluster.sh (clustering must preserve semantics).
"""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.backend.xla import XlaExecutor

from checks import assert_close_reference


def check_kernel(name, cluster=None, shape=None):
  stencil = corpus.build(name)
  shape = shape or corpus.TEST_DIMS[name]
  inputs = reference.make_test_inputs(stencil, shape)
  params = reference.make_test_params(stencil)
  want = reference.run(stencil, inputs, params)
  executor = XlaExecutor(stencil, shape, cluster=cluster)
  got = executor(inputs, params)
  for out_name in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out_name)
    assert_close_reference(
        np.asarray(got[out_name])[region], want[out_name][region],
        stencil.symbol_table[out_name].is_float, f'{name}:{out_name}')


@pytest.mark.parametrize('name', sorted(corpus.CORPUS))
def test_corpus_xla_matches_oracle(name):
  check_kernel(name)


@pytest.mark.parametrize('name', ['blur', 'sobel2d', 'jacobi2d', 'xcorr'])
def test_cluster_coarse_preserves_semantics(name):
  check_kernel(name, cluster='coarse')


def test_int16_wraparound_parity():
  # big enough grid to wrap int16 partial sums (same rationale as the
  # oracle's xcorr test)
  check_kernel('xcorr', shape=(96, 64))
