"""Mutating rewrites over the expression IR.

Equivalent of the reference's src/soda/mutator.py: ``shift`` (pointwise
index offsetting), ``normalize`` (least index to 0), and
``replace_expressions`` (normalization-aware CSE substitution).
"""

from __future__ import annotations

import collections
import logging
import operator
import types
from typing import Mapping, MutableMapping, Optional, Tuple

from soda_tpu.ir import nodes as ir
from soda_tpu.ir import visitor

_logger = logging.getLogger().getChild(__name__)


def shift(obj, offset, excluded=(), op=operator.sub):
  """Shift all Refs (except ``excluded`` names) by ``offset`` pointwise.

  Same contract as reference mutator.py:23-60: for an IR node a new
  object is returned; for a Tensor its fields are mutated in place.
  """

  def cb(node, _):
    if isinstance(node, ir.Ref) and node.name not in excluded:
      node.idx = tuple(op(a, b) for a, b in zip(node.idx, offset))
    return node

  if isinstance(obj, ir.Node):
    return obj.visit(cb)
  if hasattr(obj, 'mutate'):
    obj.mutate(cb)
    return obj
  raise TypeError('argument is not an IR node or a tensor')


def normalize(obj, references: Optional[Mapping[str, Tuple[int, ...]]] = None):
  """Shift so the least access index (column-major order) becomes 0."""
  if isinstance(obj, types.GeneratorType):
    return normalize(tuple(obj), references)
  norm_idx = visitor.get_normalize_index(obj, references)
  shifter = lambda x: shift(x, norm_idx) if any(norm_idx) else x
  if isinstance(obj, ir.Node):
    return shifter(obj)
  if isinstance(obj, collections.abc.Iterable):
    return type(obj)(map(shifter, obj))
  raise TypeError('argument is not an ir.Node or an iterable of ir.Nodes')


def replace_expressions(
    obj: ir.Node,
    cses: MutableMapping[ir.Node, ir.Ref],
    used: Optional[MutableMapping[ir.Node, ir.Node]] = None,
    references: Optional[Mapping[str, Tuple[int, ...]]] = None,
) -> ir.Node:
  """Substitute common subexpressions, normalization-aware.

  ``cses`` maps normalized subexpressions to replacement Refs; any
  sub-node equal (after normalization) to a key is replaced by the
  mapped Ref shifted back by the normalization index. Mirrors reference
  mutator.py:91-129.
  """

  def cb(node, args):
    cses, used = args
    norm_idx = visitor.get_normalize_index(node, references)
    normalized = shift(node, norm_idx) if any(norm_idx) else node
    if normalized in cses:
      if used is not None and normalized not in used:
        used[normalized] = replace_expressions(
            normalized, {k: v for k, v in cses.items() if k != normalized},
            used)
      new_node = shift(cses[normalized], norm_idx, op=operator.add)
      _logger.debug('replacing %s with %s', node, new_node)
      return new_node
    return node

  return obj.visit(cb, (cses, used))
