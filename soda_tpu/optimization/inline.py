"""Inlining and reduction rebalancing passes.

Rebuild of /root/reference/src/soda/optimization/inline.py:
``inline`` folds local stmts referenced exactly once into their consumer
with index shifting (inline.py:13-80); ``inline2`` handles the
single-consumer multi-ref case (inline.py:83-167); ``rebalance`` splits
reductions wider than a threshold into chained local stmts
(inline.py:170-262). On TPU rebalance bounds the size of any one fused
expression so XLA/Mosaic scheduling stays tractable.
"""

from __future__ import annotations

import collections
import itertools
import logging

from soda_tpu.frontend import ast
from soda_tpu.ir import arithmetic, mutator, nodes as ir
from soda_tpu.ir import visitor
from soda_tpu.ir.types import Type

_logger = logging.getLogger().getChild(__name__)


def inline(stencil):
  """Inline statements that are only referenced once."""
  if not stencil.local_stmts:
    return stencil

  refs = {}
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    for var_name, ref_list in visitor.get_load_dict(stmt).items():
      if var_name in stencil.input_names or var_name == stmt.name:
        continue
      refs.setdefault(var_name,
                      set()).update(zip(ref_list, itertools.repeat(stmt)))

  refs = {
      name: next(iter(ref_set))
      for name, ref_set in refs.items()
      if len(ref_set) == 1 and name in stencil.local_names
  }
  if not refs:
    return stencil

  # order inlining so no statement that is itself about to be inlined is
  # referenced while rewriting (reference inline.py:35-52)
  local_stmt_table = {
      stmt.name: idx for idx, stmt in enumerate(stencil.local_stmts)
  }
  ref_queue = collections.deque(refs.items())
  sorted_refs = []
  while ref_queue:
    var_name, (ref, load_stmt) = ref_queue.popleft()
    store_stmt = stencil.local_stmts[local_stmt_table[ref.name]]
    accessed_vars = {r.name for r in visitor.get_load_set(store_stmt)}
    queued_vars = {name for name, _ in ref_queue}
    if accessed_vars & queued_vars:
      ref_queue.append((var_name, (ref, load_stmt)))
    else:
      sorted_refs.append((var_name, (ref, load_stmt)))

  for var_name, (ref, load_stmt) in sorted_refs:
    idx, store_stmt = {
        stmt.name: (i, stmt) for i, stmt in enumerate(stencil.local_stmts)
    }[var_name]
    offset = tuple(a - b for a, b in zip(store_stmt.ref.idx, ref.idx))
    shifted_ref = mutator.shift(store_stmt.ref, offset)
    lets = tuple(mutator.shift(let, offset) for let in store_stmt.let)
    expr = mutator.shift(store_stmt.expr, offset)
    _logger.info('`%s` is referenced only once, replace with `%s`',
                 shifted_ref, expr)
    replace_load = lambda obj, args: args[1] if obj == args[0] else obj
    load_stmt.let = lets + tuple(
        let.visit(replace_load, (shifted_ref, expr)) for let in load_stmt.let)
    load_stmt.expr = load_stmt.expr.visit(replace_load, (shifted_ref, expr))
    del stencil.local_stmts[idx]

  _invalidate(stencil)
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    stmt.expr = arithmetic.simplify(stmt.expr)
    stmt.let = arithmetic.simplify(stmt.let)
  return inline(stencil)


def inline2(stencil):
  """Inline statements referenced by only one other statement (possibly
  multiple times), when the producer loads exactly one ref."""
  if not stencil.local_stmts:
    return stencil

  refs = collections.OrderedDict()
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    for var_name, ref_list in visitor.get_load_dict(stmt).items():
      if var_name in stencil.input_names or var_name == stmt.name:
        continue
      refs.setdefault(var_name, collections.OrderedDict()).setdefault(
          stmt, []).extend(ref_list)

  local_exprs = {stmt.name: stmt.expr for stmt in stencil.local_stmts}
  refs = {
      name: next(iter(ref_dict.items()))
      for name, ref_dict in refs.items()
      if len(ref_dict) == 1 and name in local_exprs and
      len(visitor.get_load_set(local_exprs[name])) == 1
  }
  if not refs:
    return stencil

  local_stmt_table = {
      stmt.name: idx for idx, stmt in enumerate(stencil.local_stmts)
  }
  ref_queue = collections.deque(refs.items())
  sorted_refs = []
  while ref_queue:
    var_name, (load_stmt, ref_list) = ref_queue.popleft()
    store_stmt = stencil.local_stmts[local_stmt_table[ref_list[0].name]]
    accessed_vars = {r.name for r in visitor.get_load_set(store_stmt)}
    queued_vars = {name for name, _ in ref_queue}
    if accessed_vars & queued_vars:
      ref_queue.append((var_name, (load_stmt, ref_list)))
    else:
      sorted_refs.append((var_name, (load_stmt, ref_list)))

  for var_name, (load_stmt, ref_list) in sorted_refs:
    idx, store_stmt = {
        stmt.name: (i, stmt) for i, stmt in enumerate(stencil.local_stmts)
    }[var_name]
    ref_table = {}
    lets = ()
    for ref in ref_list:
      offset = tuple(a - b for a, b in zip(store_stmt.ref.idx, ref.idx))
      shifted_ref = mutator.shift(store_stmt.ref, offset)
      lets = tuple(mutator.shift(let, offset) for let in store_stmt.let)
      expr = mutator.shift(store_stmt.expr, offset)
      ref_table[shifted_ref] = expr
    replace_load = lambda obj, args: args.get(obj, obj)
    load_stmt.let = lets + tuple(
        let.visit(replace_load, ref_table) for let in load_stmt.let)
    load_stmt.expr = load_stmt.expr.visit(replace_load, ref_table)
    del stencil.local_stmts[idx]

  _invalidate(stencil)
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    stmt.expr = arithmetic.simplify(arithmetic.reverse_distribute(stmt.expr))
    stmt.let = arithmetic.simplify(
        tuple(map(arithmetic.reverse_distribute, stmt.let)))
  return inline2(stencil)


REBALANCE_THRESHOLDS = {
    Type('float'): 32,
}


def rebalance(stencil):
  """Split long float reductions into chained local stmts
  (reference inline.py:175-262)."""
  for stmt in itertools.chain(stencil.local_stmts, stencil.output_stmts):
    if stmt.dtype not in REBALANCE_THRESHOLDS:
      continue
    if isinstance(stmt.expr, ir.AddSub) and set(stmt.expr.operator) == {'+'}:
      reduction = []
      for operand in stmt.expr.operand:
        if isinstance(operand, ir.MulDiv) and operand.operator == ('*',):
          opds = operand.operand
          if isinstance(opds[0], ir.AddSub):
            reduction.append((opds[1], opds[0]))
          elif isinstance(opds[1], ir.AddSub):
            reduction.append((opds[0], opds[1]))
          else:
            reduction.append((None, operand))
        else:
          reduction.append((None, operand))

      get_num_items = lambda x: 1 if x[0] is None else len(x[1].operand)
      reduction.sort(key=get_num_items, reverse=True)

      num_items = 0
      reductions = [[]]
      threshold = REBALANCE_THRESHOLDS[stmt.dtype]
      for coeff, opds in reduction:
        if num_items + get_num_items((coeff, opds)) > threshold:
          reductions.append([])
          num_items = 0
        reductions[-1].append((coeff, opds))
        num_items += get_num_items((coeff, opds))
      if len(reductions) == 1:
        continue
      _logger.info("stmt %s has too many operations, breaking 'em into %d",
                   stmt.name, len(reductions))
      new_stmts = []
      new_exprs = []
      for group in reductions:
        new_operands = []
        for coeff, opds in group:
          if coeff is None:
            new_operands.append(opds)
          else:
            new_operands.append(
                ir.MulDiv(operator=('*',), operand=(opds, coeff)))
        new_exprs.append(
            stencil.propagate_type(
                ir.AddSub(operator=('+',) * (len(new_operands) - 1),
                          operand=tuple(new_operands)) if len(new_operands) >
                1 else new_operands[0]))
      for new_expr in new_exprs[:-1]:
        new_stmt_name = stencil.new_cr_var()
        new_stmts.append(
            ast.LocalStmt(ref=ir.Ref(name=new_stmt_name, lat=None,
                                     idx=(0,) * len(stmt.ref.idx)),
                          dtype=new_expr.dtype,
                          expr=new_expr,
                          let=stmt.let,
                          stencil=stencil))
      stencil.local_stmts.extend(new_stmts)
      last = new_exprs[-1]
      last_operands = last.operand if isinstance(last, ir.AddSub) else (last,)
      last_ops = last.operator if isinstance(last, ir.AddSub) else ()
      stmt.expr = ir.AddSub(
          operator=tuple(last_ops) + ('+',) * len(new_stmts),
          operand=tuple(last_operands) +
          tuple(s.ref for s in new_stmts))
      _invalidate(stencil)
      return rebalance(stencil)
  return stencil


def _invalidate(stencil):
  stencil.__dict__.pop('symbol_table', None)
  stencil.__dict__.pop('local_names', None)
  stencil.__dict__.pop('local_types', None)
