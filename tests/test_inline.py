"""Inlining pass tests (contracts from reference test_inline.py:24-113)."""

from soda_tpu.api import build_stencil
from soda_tpu.optimization import inline

HEADER = '''
kernel: blur
burst width: 512
unroll factor: 16
iterate: 1
border: preserve
cluster: none
'''


def _stencil(body):
  return build_stencil(HEADER + body)


def test_simple_inlining():
  stencil = _stencil('''
input float: t0(233, *)
local float: t1(-1, -2) = t0(0, 1)
output float: t2(4, 2) = t1(2, 3)
''')
  inline.inline(stencil)
  assert len(stencil.local_stmts) == 0
  assert len(stencil.output_stmts) == 1
  assert str(stencil.output_stmts[0]) == \
      'output dram 0 float: t2(4, 2) = t0(3, 6)'


def test_let_in_local():
  stencil = _stencil('''
input float: t0(233, *)
local float: float l = t0(0, 1) t1(-1, -2) = l
output float: t2(4, 2) = t1(2, 3)
''')
  inline.inline(stencil)
  assert len(stencil.local_stmts) == 0
  assert str(stencil.output_stmts[0]) == (
      'output dram 0 float:\n  float l = t0(3, 6)\n  t2(4, 2) = l')


def test_let_in_output():
  stencil = _stencil('''
input float: t0(233, *)
local float: t1(-1, -2) = t0(0, 1)
output float: float l = t1(2, 3) t2(4, 2) = l
''')
  inline.inline(stencil)
  assert len(stencil.local_stmts) == 0
  assert str(stencil.output_stmts[0]) == (
      'output dram 0 float:\n  float l = t0(3, 6)\n  t2(4, 2) = l')


def test_no_inline_when_referenced_twice():
  stencil = _stencil('''
input float: t0(233, *)
local float: t1(-1, -2) = t0(0, 1)
local float: t2(0, 0) = t1(0, 0)
output float: t3(4, 2) = t2(0, 0) + t1(0, 0) + t2(0, 1)
''')
  inline.inline(stencil)
  assert len(stencil.local_stmts) == 2
  assert str(stencil.output_stmts[0]) == (
      'output dram 0 float: t3(4, 2) = t2(0, 0) + t1(0, 0) + t2(0, 1)')


def test_rebalance_splits_wide_float_reductions():
  terms = ' + '.join('in_(%d, 0)' % i for i in range(70))
  stencil = _stencil('''
input float: in_(233, *)
output float: out(0, 0) = %s
''' % terms)
  # rebalance runs inside Stencil.__init__; 70 > 32 so it must split
  assert len(stencil.local_stmts) >= 1
  total_terms = 0
  import soda_tpu.ir.visitor as v
  for stmt in stencil.local_stmts + stencil.output_stmts:
    loads = [r for r in v.get_load_tuple(stmt.expr) if r.name == 'in_']
    total_terms += len(loads)
  assert total_terms == 70  # no term lost or duplicated


def test_rebalance_leaves_short_reductions_alone():
  terms = ' + '.join('in_(%d, 0)' % i for i in range(10))
  stencil = _stencil('''
input float: in_(233, *)
output float: out(0, 0) = %s
''' % terms)
  assert len(stencil.local_stmts) == 0


def test_inline2_multi_offset_producer_with_lets():
  """Each fold site must get its own shifted, renamed copy of the
  producer's lets (code-review regression: one shared copy evaluated
  every site at the LAST site's offset)."""
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(64, *)
local float:
  float s = x(0, 0) * 2.0f
  p(0, 0) = s + x(0, 0)
output dram 1 float: o(0, 0) = p(0, 0) + p(1, 0)
"""
  import numpy as np
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.optimization import inline as inline_mod
  plain = api.build_stencil(src)
  folded = api.build_stencil(src)
  inline_mod.inline2(folded)
  assert not folded.local_stmts  # p folded away
  shape = (16, 64)
  ins = reference.make_test_inputs(plain, shape)
  want = reference.run(plain, ins)
  got = reference.run(folded, ins)
  region = reference.output_valid_slices(plain, shape, 'o')
  np.testing.assert_allclose(np.asarray(got['o'])[region],
                             np.asarray(want['o'])[region],
                             rtol=1e-6, atol=1e-6)


def test_inline_producer_let_name_collision_with_consumer():
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(64, *)
local float:
  float s = x(0, 0) * 2.0f
  p(0, 0) = s + 1.0f
output dram 1 float:
  float s = x(0, 1) * 3.0f
  o(0, 0) = p(1, 0) + s
"""
  import numpy as np
  from soda_tpu import api
  from soda_tpu.backend import reference
  plain = api.build_stencil(src)
  folded = api.build_stencil(src, optimizations={'inline': True})
  assert not folded.local_stmts
  shape = (16, 64)
  ins = reference.make_test_inputs(plain, shape)
  want = reference.run(plain, ins)
  got = reference.run(folded, ins)
  region = reference.output_valid_slices(plain, shape, 'o')
  np.testing.assert_allclose(np.asarray(got['o'])[region],
                             np.asarray(want['o'])[region],
                             rtol=1e-6, atol=1e-6)


def test_rebalance_spills_accumulate_at_promoted_width():
  """C evaluates the un-split reduction at the promoted width; spills
  must not wrap partial sums early when the store is wider than the
  terms (code-review regression: int16 taps, int32 output)."""
  import numpy as np
  from soda_tpu import api
  from soda_tpu.backend import reference
  taps = ' + '.join('t(0, %d)' % j for j in range(15))
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 int16: t(64, *)
output dram 1 int32: o(0, 0) = %s
""" % taps
  st = api.build_stencil(src)  # rebalance (threshold 12) splits this
  assert st.local_stmts, 'expected a rebalance spill'
  assert all(s.dtype.width_in_bits >= 32 for s in st.local_stmts)
  shape = (16, 64)
  ins = {'t': np.full(shape, 32000, np.int16)}  # 15 x 32000 > int16
  want = reference.run(st, ins)
  region = reference.output_valid_slices(st, shape, 'o')
  assert int(np.asarray(want['o'])[region][0, 0]) == 15 * 32000
