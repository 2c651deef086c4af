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
