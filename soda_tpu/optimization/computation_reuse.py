"""Computation-reuse (CSE) pass — the DAC'20 engine.

Rebuild of /root/reference/src/soda/optimization/computation_reuse.py.
This module currently provides the pass entry point, attribute
extraction, and the Linearizer; the scheduler family (exact DP, greedy,
beam, external C++ binary) lives in
``soda_tpu.optimization.cr_schedules`` and is dispatched from
``Expression.best_schedule`` exactly as the reference does
(computation_reuse.py:1838-1857).
"""

from __future__ import annotations

import collections
import itertools
import logging
import operator
from typing import Dict, Iterator, List, MutableMapping, Optional, Sequence, Tuple, Union

from soda_tpu.ir import arithmetic, mutator, nodes as ir
from soda_tpu.ir import visitor

RelativeAttr = int
AbsoluteAttr = int
Attr = Union[RelativeAttr, Tuple[RelativeAttr, Optional[AbsoluteAttr]]]

OrderedDict = collections.OrderedDict

_logger = logging.getLogger().getChild(__name__)


def extract_attr(node: ir.Node) -> Tuple[Tuple[int, ...], ir.Node]:
  """Split a node into (load index, normalized coefficient subtree)
  (reference computation_reuse.py:43-56)."""
  load = visitor.get_load_set(node)[0]
  return load.idx, mutator.shift(node, load.idx)


def assemble_attr(rattr: Tuple[int, ...], aattr: ir.Node) -> ir.Node:
  """Inverse of extract_attr (reference computation_reuse.py:59-72)."""
  return mutator.shift(aattr, rattr, op=operator.add)


class Linearizer:
  """Linearize N-D relative indices into scalars and back
  (reference computation_reuse.py:75-156).

  The linearized size of each dimension is (span * 2 - 1) so that any
  difference of two indices remains uniquely decodable; if a tile size
  is given, the non-streaming dims use the tile sizes instead.
  """

  def __init__(self, rattrs: Sequence[Sequence[int]],
               tile_size: Sequence[int] = ()):
    num_dim = len(rattrs[0])
    self.maxs = [0] * num_dim
    self.mins = [0] * num_dim
    for d in self.dims:
      self.maxs[d] = max(rattr[d] for rattr in rattrs)
      self.mins[d] = min(rattr[d] for rattr in rattrs)
    if tile_size:
      self.sizes = tuple(tile_size)[:-1] + (
          (self.maxs[-1] - self.mins[-1] + 1) * 2 - 1,)
    else:
      self.sizes = tuple(
          (self.maxs[d] - self.mins[d] + 1) * 2 - 1 for d in self.dims)

  @property
  def num_dim(self) -> int:
    return len(self.maxs)

  @property
  def weights(self) -> List[int]:
    weights = [1] * self.num_dim
    for d in self.dims[1:]:
      weights[d] = weights[d - 1] * self.sizes[d - 1]
    return weights

  @property
  def dims(self) -> Tuple[int, ...]:
    return tuple(range(self.num_dim))

  def apply(self, rattr: Sequence[int]) -> int:
    return sum(
        (rval - min_val) * weight
        for rval, weight, min_val in zip(rattr, self.weights, self.mins))

  def restore(self, rattr: int) -> Tuple[int, ...]:
    restored = []
    for d in reversed(self.dims):
      rval = rattr // self.weights[d]
      rattr -= rval * self.weights[d]
      restored.append(self.mins[d] + rval)
    return tuple(reversed(restored))

  def __call__(self, rattr):
    if isinstance(rattr, int):
      return self.restore(rattr)
    if isinstance(rattr, Sequence) and isinstance(rattr[0], int):
      return self.apply(rattr)
    raise TypeError('rattr needs to be an int or a Sequence of int')


def range_from_middle(n: int) -> Iterator[int]:
  """Yield 0..n-1 starting from the middle outward (reference
  computation_reuse.py:159-177); improves DP cache behavior."""
  middle = n // 2
  if n % 2 == 0:
    for shift in range(0, middle):
      yield middle - shift - 1
      yield middle + shift
  else:
    yield middle
    for shift in range(1, middle + 1):
      yield middle - shift
      yield middle + shift


def computation_reuse(stencil):
  """Pass entry: rewrite reductions with reused subexpressions.

  No-op unless ``stencil.optimizations['computation-reuse']`` selects a
  method (reference computation_reuse.py:202-204).
  """
  method = stencil.optimizations.get('computation-reuse')
  if method is None or method == 'no':
    return stencil
  _logger.debug('invoke stencil computation reuse')
  from soda_tpu.optimization.cr_schedules import Expression
  from soda_tpu.frontend import ast

  def cr_visitor(node: ir.Node, cses: MutableMapping) -> ir.Node:
    try:
      expression = Expression(node, stencil)
      if expression.best_schedule is not None:
        _logger.debug('best schedule: (cost: %s)',
                      expression.best_schedule.cost)
        return expression.get_ir_node_with_cr(stencil, cses)
    except Expression.CannotHandle:
      pass
    return node

  new_local_stmts = []
  cses: Dict[ir.Node, ir.Ref] = OrderedDict()
  emitted: Dict[str, object] = {}  # cr_var name -> its LocalStmt
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    stmt.propagate_type()
    stmt.expr = stmt.expr.visit(cr_visitor, cses)
    stmt.let = tuple(let.visit(cr_visitor, cses) for let in stmt.let)
    # one LocalStmt per cr_var NAME: a later statement's absolute CSE
    # may re-key an earlier definition (it then reads the shared
    # coefficient variables) or add a new variable whose definition
    # happens to equal an existing one — dedup by name, not expression
    for expr, ref in cses.items():
      prev = emitted.get(ref.name)
      if prev is not None and prev.expr == expr:
        continue
      expr = stencil.propagate_type(expr, stmt)
      if prev is not None:
        prev.expr = expr
        continue
      # declare reuse variables at the C-PROMOTED width: the original
      # (un-rewritten) reduction computed its partial sums in promoted
      # arithmetic with NO intermediate wraps, so a narrow cr_var
      # store would add wraps the source program never had — wrong
      # whenever the reduction feeds a non-ring consumer (e.g.
      # `(a+b+c+d)/256` over uint16 taps; caught by extended fuzzing)
      decl = expr.dtype
      if decl is not None and not decl.is_float:
        from soda_tpu.backend.semantics import promote
        decl = promote(decl)
      # record the new variable's type so later vars / stmts referencing
      # it propagate correctly (bottom-up insertion order guarantees
      # dependees come first)
      stencil.symbol_table[ref.name] = decl
      new_local_stmts.append(
          ast.LocalStmt(ref=ref, dtype=decl, expr=expr, let=stmt.let,
                        stencil=stencil))
      emitted[ref.name] = new_local_stmts[-1]
      _logger.debug('computation reuse stmt: %s', new_local_stmts[-1])
  stencil.local_stmts.extend(new_local_stmts)

  stencil.__dict__.pop('symbol_table', None)
  stencil.__dict__.pop('local_names', None)
  stencil.__dict__.pop('local_types', None)

  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    stmt.expr = arithmetic.simplify(stmt.expr)
    stmt.let = arithmetic.simplify(stmt.let)
  _logger.info('stencil after CR: \n  %s', str(stencil).replace('\n', '\n  '))
  return stencil
