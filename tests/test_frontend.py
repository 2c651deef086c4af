"""Frontend tests: parsing, printing, round-trip fidelity.

Mirrors the contract of the reference's src/tests/test_grammar.py
(round-trip a maximal DSL program; direct AST construction/printing),
adapted to this frontend's canonical-parenthesization printing.
"""

import glob

import pytest

from soda_tpu import corpus
from soda_tpu.frontend import ast, parser
from soda_tpu.ir import nodes as ir
from soda_tpu.ir.types import Type

MAXIMAL_PROGRAM = '''
border: ignore
burst width: 512
cluster: none
iterate: 2
kernel: name
unroll factor: 1
input dram 0 float: bbb
input dram 1 uint6: a(233, *)
param int8: p0
param int9, dup 3: p1[23]
param int10, partition complete: p2[23]
param int11, partition complete dim=1: p2b[23]
param int12, partition cyclic factor=23: p3[233]
param int13, partition cyclic factor=23 dim=2: p4[233][233]
param int14, partition complete, dup 3: p5[23]
local int27:
  int32 l = int32(a(0, 0) ~1 + b(1, 0))
  int32 g = int32(a(0, 0) ~1 + p0 + p1[1][3])
  c(0, 0) ~3 = +-+-l * --+~l
output dram 2 double:
  float18_3 l = float18_3(c(0, 1) ~5) + a(1, 0)
  d(0, 0) = sqrt(float15(l <= l / 2))
output dram 3 double:
  float18_3 l = float18_3(c(0, 1) ~5) + a(1, 0)
  e(0, 0) = float15(l + l / 2)
'''.strip('\n')


def test_maximal_program_round_trip():
  p1 = parser.parse(MAXIMAL_PROGRAM)
  s1 = str(p1)
  assert s1 == MAXIMAL_PROGRAM
  p2 = parser.parse(s1)
  assert str(p2) == s1
  assert p1 == p2


@pytest.mark.parametrize('name', sorted(corpus.CORPUS))
def test_corpus_round_trip(name):
  # the corpus restates the reference's tests/src/*.soda workloads;
  # round-tripping it keeps the suite independent of the reference
  # checkout being present
  src = corpus.CORPUS[name]
  p1 = parser.parse(src)
  s1 = str(p1)
  p2 = parser.parse(s1)
  assert str(p2) == s1, 'printing is not idempotent'
  assert p1 == p2, 'print->parse is not structurally stable'


@pytest.mark.parametrize(
    'path', sorted(glob.glob('/root/reference/tests/src/*.soda')),
    ids=lambda p: p.split('/')[-1])
def test_reference_corpus_round_trip(path):
  # optional extra coverage when the reference checkout exists
  # (parametrization is empty otherwise)
  src = open(path).read()
  p1 = parser.parse(src)
  s1 = str(p1)
  p2 = parser.parse(s1)
  assert str(p2) == s1, 'printing is not idempotent'
  assert p1 == p2, 'print->parse is not structurally stable'


def _ref(name, idx):
  return ir.Ref(name=name, idx=idx, lat=None)


def test_input_stmt_str():
  int8 = Type('int8')
  assert str(ast.InputStmt(dtype=int8, name='foo', tile_size=(),
                           dram=())) == 'input dram 0 int8: foo'
  assert str(ast.InputStmt(dtype=int8, name='foo', tile_size=(23,),
                           dram=())) == 'input dram 0 int8: foo(23, *)'
  assert str(ast.InputStmt(
      dtype=int8, name='foo', tile_size=(23, 233),
      dram=())) == 'input dram 0 int8: foo(23, 233, *)'


def test_input_stmt_sentinel_and_default_dram():
  stmt = ast.InputStmt(dtype=Type('uint16'), name='x', tile_size=(100,),
                       dram=())
  assert stmt.tile_size == (100, 0)
  assert stmt.dram == (0,)


def test_local_and_output_stmt_str():
  int8 = Type('int8')
  ref = _ref('foo', (0, 23))
  expr = _ref('bar', (233, 42))
  local = ast.LocalStmt(dtype=int8, let=(), ref=ref, expr=expr)
  assert str(local) == 'local int8: foo(0, 23) = bar(233, 42)'
  let = ir.Let(dtype=int8, name='foo_l', expr=_ref('bar_l', (42, 2333)))
  local2 = ast.LocalStmt(dtype=int8, let=(let,), ref=ref, expr=expr)
  assert str(local2) == ('local int8:\n  int8 foo_l = bar_l(42, 2333)\n'
                         '  foo(0, 23) = bar(233, 42)')
  out = ast.OutputStmt(dtype=int8, let=(), ref=ref, expr=expr, dram=())
  assert str(out) == 'output dram 0 int8: foo(0, 23) = bar(233, 42)'


def test_let_types_bound_to_vars():
  src = '''
burst width: 64
iterate: 1
kernel: k
unroll factor: 1
input float: a(8, *)
output float:
  int32 l = a(0, 0)
  b(0, 0) = l + l
'''.strip()
  prog = parser.parse(src)
  stmt = prog.output_stmts[0]
  for var in stmt.expr.operand:
    assert var.dtype == Type('int32')


def test_tile_size_mismatch_raises():
  src = '''
burst width: 64
iterate: 1
kernel: k
unroll factor: 1
input float: a(8, *)
input float: b(16, *)
output float: c(0, 0) = a(0, 0) + b(0, 0)
'''.strip()
  from soda_tpu.utils import SemanticError
  with pytest.raises(SemanticError):
    parser.parse(src)


def test_expression_precedence():
  src = '''
burst width: 64
iterate: 1
kernel: k
unroll factor: 1
input int32: a(8, *)
output int32: c(0, 0) = a(0, 0) + a(1, 0) * 2 - a(2, 0) / 4 % 3
'''.strip()
  prog = parser.parse(src)
  expr = prog.output_stmts[0].expr
  assert isinstance(expr, ir.AddSub)
  assert expr.operator == ('+', '-')
  assert isinstance(expr.operand[1], ir.MulDiv)
  assert isinstance(expr.operand[2], ir.MulDiv)
  assert expr.operand[2].operator == ('/', '%')


def test_multibank_dram_lists():
  src = '''
burst width: 64
iterate: 1
kernel: k
unroll factor: 1
input dram 0.1.2 int32: a(8, *)
output dram 3.2 int32: c(0, 0) = a(0, 0)
'''.strip()
  prog = parser.parse(src)
  assert prog.input_stmts[0].dram == (0, 1, 2)
  assert prog.output_stmts[0].dram == (3, 2)
  assert 'dram 0.1.2' in str(prog.input_stmts[0])


def test_num_literals():
  src = '''
burst width: 64
iterate: 1
kernel: k
unroll factor: 1
input float: a(8, *)
output float: c(0, 0) = a(0, 0) * 0.2f + a(1, 0) * .125f - 1e-3f + 7
'''.strip()
  prog = parser.parse(src)
  nums = []

  def collect(node, args):
    if isinstance(node, ir.Num):
      args.append(node)
    return node

  prog.output_stmts[0].expr.visit(collect, nums)
  by_val = {n.lexeme: n for n in nums}
  assert by_val['0.2f'].value == 0.2 and by_val['0.2f'].dtype == Type('float')
  assert by_val['.125f'].value == 0.125
  assert by_val['7'].value == 7 and by_val['7'].dtype is None
