"""Narrow 16-bit stage evaluation: eligibility analysis + executor
differential tests.

The feature (optimization/ranges.narrow16_stages +
semantics.Evaluator(narrow=True) + the PallasExecutor value-mode
integration) evaluates eligible integer stages at native i16/u16 for
2x VPU lane density. These tests pin the eligibility rules and verify
bit-exactness against the NumPy oracle via interpret mode.
"""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.api import build_stencil
from soda_tpu.backend import reference
from soda_tpu.backend.pallas_kernel import PallasExecutor
from soda_tpu.backend.plan import make_plan
from soda_tpu.optimization import ranges


def _narrow(stencil):
  make_plan(stencil, 'full')
  return ranges.narrow16_stages(stencil)


def _src(body, in_type='int16', out_type='int16', width=64):
  return '\n'.join([
      'kernel: nrw', 'burst width: 64', 'unroll factor: 1',
      'iterate: 1', 'border: ignore', 'cluster: none',
      'input %s: a(%d, *)' % (in_type, width),
  ] + body)


class TestEligibility:

  def test_xcorr_sums_are_narrow(self):
    s = corpus.build('xcorr',
                     optimizations={'computation-reuse': 'greedy'})
    nw = _narrow(s)
    total = sum(1 for t in s.chronological_tensors if not t.is_input())
    # everything except the final (sub/mul/div) stage runs narrow
    assert len(nw) == total - 1

  def test_min_stages_not_narrow(self):
    # Mosaic cannot legalize i16 min (exp12/13): erosion stays wide
    s = corpus.build('erosion',
                     optimizations={'computation-reuse': 'greedy'})
    assert not _narrow(s)

  def test_float_kernels_not_narrow(self):
    for name in ('contrast', 'jacobi2d', 'blur'):
      assert not _narrow(corpus.build(name))

  def test_division_in_stage_blocks_narrow(self):
    s = build_stencil(_src(
        ['output int16: y(0, 0) = (a(0, 0) + a(0, 1) + a(1, 0)) / 4']))
    assert not _narrow(s)

  def test_sum_stage_feeding_division_is_narrow(self):
    # the SUM stage wraps to int16 by its own store; the consumer's
    # division sees the wrapped value either way
    s = build_stencil(_src([
        'local int16: t(0, 0) = a(0, 0) + a(0, 1) + a(1, 0) + a(1, 1)',
        'output int16: y(0, 0) = t(0, 0) / 4',
    ]))
    assert _narrow(s) == {'t'}

  def test_wide_partial_sum_narrow_only_when_ring_flow(self):
    # int32-declared partial sum -> 16-bit-wrapped output: narrow OK
    # (the wrap-sinking need analysis proves mod-2^16 suffices)
    s = build_stencil(_src([
        'local int32: t(0, 0) = a(0, 0) + a(0, 1)',
        'output int16: y(0, 0) = t(0, 0) + a(1, 0)',
    ]))
    assert 't' in _narrow(s)
    # ...but a division consumer demands the exact int32 value
    s = build_stencil(_src([
        'local int32: t(0, 0) = a(0, 0) + a(0, 1)',
        'output int16: y(0, 0) = int16(t(0, 0) / 3)',
    ]))
    assert 't' not in _narrow(s)

  def test_subtraction_blocks_narrow(self):
    # Mosaic i16 sub crashes (exp13); '-' stages stay wide
    s = build_stencil(_src(
        ['output int16: y(0, 0) = a(0, 0) - a(0, 1)']))
    assert not _narrow(s)

  def test_bitwise_is_narrow(self):
    s = build_stencil(_src([
        'output uint16: y(0, 0) = (a(0, 0) & a(0, 1)) ^ a(1, 0)',
    ], in_type='uint16', out_type='uint16'))
    assert _narrow(s) == {'y'}


def _check(source, shape=(64, 64), **build_kw):
  s = build_stencil(source, **build_kw)
  inputs = reference.make_test_inputs(s, shape)
  want = reference.run(s, inputs)
  on = PallasExecutor(s, shape, stage_mode='value', narrow='on')
  off = PallasExecutor(s, shape, stage_mode='value', narrow='off')
  for out in s.output_names:
    region = reference.output_valid_slices(s, shape, out)
    got_on = np.asarray(on(inputs)[out])[region]
    got_off = np.asarray(off(inputs)[out])[region]
    w = want[out][region]
    np.testing.assert_array_equal(got_on, w)
    np.testing.assert_array_equal(got_off, w)


class TestDifferential:

  def test_uint16_sum_then_divide(self):
    # the wrap matters: uint16 sums overflow and the division must see
    # the wrapped value (the round-2 extended-fuzz find, inverted)
    _check(_src([
        'local uint16: t(0, 0) = '
        'a(0, 0) + a(0, 1) + a(1, 0) + a(1, 1)',
        'output uint16: y(0, 0) = t(0, 0) / 4',
    ], in_type='uint16'))

  def test_int16_signed_wraps(self):
    _check(_src([
        'local int16: t(0, 9) = '
        'a(0, 0) + a(0, 3) + a(0, 6) + a(0, 9) + a(0, 12)',
        'output int16: y(0, 0) = t(0, 0) / 8',
    ]))

  def test_mixed_signedness(self):
    _check('\n'.join([
        'kernel: mixed', 'burst width: 64', 'unroll factor: 1',
        'iterate: 1', 'border: ignore', 'cluster: none',
        'input int16: a(64, *)',
        'input uint16: b(64, *)',
        'local uint16: t(0, 0) = a(0, 0) + b(0, 1) + a(1, 0)',
        'output uint16: y(0, 0) = t(0, 0) / 3',
    ]))

  def test_wide_partial_sums_into_wrapped_output(self):
    _check(_src([
        'local int32: t(0, 0) = a(0, 0) + a(0, 1) + a(0, 2)',
        'local int32: u(0, 0) = a(1, 0) + a(1, 1) + a(1, 2)',
        'output int16: y(0, 0) = int16(t(0, 0) + u(1, 0))',
    ]))

  def test_xcorr_full_pipeline(self):
    for ov in ({}, {'optimizations': {'computation-reuse': 'greedy'}}):
      s = corpus.build('xcorr', tile_size=(128, 0), **ov)
      shape = (96, 128)
      inputs = reference.make_test_inputs(s, shape)
      want = reference.run(s, inputs)
      ex = PallasExecutor(s, shape, stage_mode='value', narrow='on')
      got = ex(inputs)
      region = reference.output_valid_slices(s, shape, 'tmp3')
      np.testing.assert_array_equal(
          np.asarray(got['tmp3'])[region], want['tmp3'][region])

  def test_narrow_knob_validation(self):
    s = corpus.build('xcorr', tile_size=(128, 0))
    with pytest.raises(ValueError, match='narrow'):
      PallasExecutor(s, (96, 128), narrow='yes')


class TestOutputWidthGuard:
  """A >16-bit OUTPUT consumed in-graph must not narrow: _wrap_need is
  driven by the in-graph consumers only, while the external HBM store
  needs the full declared width (r3 review find)."""

  def test_wide_output_with_16bit_consumer_stays_wide(self):
    s = build_stencil(_src([
        'output int32: b(0, 0) = a(0, 0) + a(0, 1) + a(1, 0)',
        'output int16: c(0, 0) = int16(b(0, 0) + b(0, 1))',
    ], in_type='int32'))
    assert 'b' not in _narrow(s)

  def test_wide_local_with_16bit_consumer_may_narrow(self):
    # same shape but b is a LOCAL: no external store, so the in-graph
    # 16-bit need alone governs eligibility
    s = build_stencil(_src([
        'local int32: b(0, 0) = a(0, 0) + a(0, 1) + a(1, 0)',
        'output int16: c(0, 0) = int16(b(0, 0) + b(0, 1))',
    ], in_type='int32'))
    assert 'b' in _narrow(s)


def test_narrow_composes_with_roll_mode():
  """narrow='on' + shift_mode='roll': stream-axis shifts of narrow
  stage values route through axis_roll, which must widen sub-32-bit
  vectors for Mosaic (r3 review find; interpret checks the semantics,
  the hardware gate checks the legality)."""
  s = build_stencil(_src([
      'local int16: t(0, 0) = a(0, 0) + a(0, 3) + a(3, 0)',
      'output int16: y(0, 0) = int16(t(0, 0) + t(1, 1) + t(2, 2))',
  ]))
  shape = (64, 64)
  inputs = reference.make_test_inputs(s, shape)
  want = reference.run(s, inputs)
  ex = PallasExecutor(s, shape, stage_mode='value', narrow='on',
                      shift_mode='roll')
  got = ex(inputs)
  region = reference.output_valid_slices(s, shape, 'y')
  np.testing.assert_array_equal(np.asarray(got['y'])[region],
                                want['y'][region])
