"""Value-range analysis and wrap sinking (soda_tpu.optimization.ranges).

The range half proves no-op store wraps (value fits the declared type)
and exact-f32 integer division. The sinking half elides a stage's wrap
when every consumer use passes only through ring / bit-local ops into
a wrap of the same-or-narrower width (mod-2^n homomorphism — the same
fact that makes the reference's CR rewrite of integer reductions exact,
computation_reuse.py:755-813). Each positive case is backed by a
bit-exactness differential against the NumPy oracle with values that
genuinely overflow the storage width.
"""

import numpy as np

from soda_tpu import api
from soda_tpu.backend import reference
from soda_tpu.backend.pallas_kernel import PallasExecutor
from soda_tpu.backend.reference import output_valid_slices
from soda_tpu.optimization import ranges

_HEADER = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
"""


def _build(body: str):
  stencil = api.build_stencil(_HEADER + body)
  ranges.annotate(stencil)
  return stencil


def _assert_bit_exact(stencil, shape=(32, 128)):
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = PallasExecutor(stencil, shape)(inputs)
  for name in stencil.output_names:
    region = output_valid_slices(stencil, shape, name)
    np.testing.assert_array_equal(
        np.asarray(want[name])[region], np.asarray(got[name])[region])


def test_sum_chain_wraps_sink():
  # both partial sums overflow int16; their wraps sink into the
  # output's store wrap (mod 2^16 of sums == sum of mod 2^16)
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1) + x(1, 0)
local int16: b(0, 0) = a(0, 0) + a(1, 1) + a(0, 2)
output dram 1 int16: y(0, 0) = b(0, 0) + b(1, 0)
""")
  assert st._wrap_free == {'a': True, 'b': True, 'y': False}
  _assert_bit_exact(st)


def test_division_pins_producer():
  # b feeds a division: its true (wrapped) value is required
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1)
local int16: b(0, 0) = a(0, 0) + a(1, 0)
output dram 1 int16: y(0, 0) = b(0, 0) / 7
""")
  assert st._wrap_free['b'] is False
  assert st._wrap_free['a'] is True  # ring use inside b, which wraps
  _assert_bit_exact(st)


def test_minmax_pins_producer():
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1)
output dram 1 int16: y(0, 0) = min(a(0, 0), a(1, 0))
""")
  assert st._wrap_free['a'] is False
  _assert_bit_exact(st)


def test_wider_downstream_wrap_blocks_sinking():
  # a:int16 consumed by an int32 stage: correctness mod 2^32 of b
  # demands the exact int16 value of a (k * 2^16 error survives mod
  # 2^32), so a must wrap even though every use is a ring op
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1)
local int32: b(0, 0) = int32(a(0, 0)) * int32(a(1, 0))
output dram 1 int32: y(0, 0) = b(0, 0) + b(1, 0)
""")
  assert st._wrap_free['a'] is False
  _assert_bit_exact(st)


def test_sink_through_narrowing_cast():
  # the int16 cast inside z's expr wraps mod 2^16 itself, so a's
  # congruence mod 2^16 suffices even though z is stored at int32
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1)
output dram 1 int32: z(0, 0) = int32(int16(a(0, 0) + a(1, 0)))
""")
  assert st._wrap_free['a'] is True
  _assert_bit_exact(st)


def test_range_elided_consumer_blocks_sinking_when_feeding_division():
  # b's range fits int16 (x/8 + x/8 stays in range) so b never wraps;
  # its value flows into a division, so the analysis must demand exact
  # producers: a (which overflows) must wrap
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) + x(0, 1)
local int16: b(0, 0) = a(0, 0) / 8 + a(1, 0) / 8
output dram 1 int16: y(0, 0) = b(0, 0) / 3
""")
  assert st._wrap_free['a'] is False
  assert st._wrap_free['b'] is True  # by range
  _assert_bit_exact(st)


def test_unsigned_sum_chain_sinks():
  st = _build("""
input dram 0 uint16: x(128, *)
local uint16: a(0, 0) = x(0, 0) + x(0, 1) + x(0, 2)
output dram 1 uint16: y(0, 0) = a(0, 0) + a(1, 0) + a(2, 0)
""")
  assert st._wrap_free['a'] is True
  _assert_bit_exact(st)


def test_paren_wrapper_range_passes_through():
  # a single-operand chain wrapper (parenthesized subexpression) is
  # not a comparison: its range must not collapse to (0, 1). y's
  # dividend exceeds the f32 mantissa bound, so the exact-f32 division
  # fast path must NOT be proven
  st = _build("""
input dram 0 int32: x(128, *)
output dram 1 int32: y(0, 0) = (x(0, 0) * x(0, 1)) / 3
""")
  table = ranges.annotate(st)
  assert table['y'][1] > 1  # not the (0, 1) comparison range
  node = st.tensors['y'].expr
  flags = []

  def collect(n, _):
    flags.extend(getattr(n, 'div_f32_ok', ()) or ())
    return n

  node.visit(collect)
  assert True not in flags


def test_mul_chain_sinks_through_multiplication():
  # multiplication is a ring op: overflowing products still sink
  st = _build("""
input dram 0 int16: x(128, *)
local int16: a(0, 0) = x(0, 0) * x(0, 1)
output dram 1 int16: y(0, 0) = a(0, 0) * a(1, 0) + a(0, 1)
""")
  assert st._wrap_free['a'] is True
  _assert_bit_exact(st)
