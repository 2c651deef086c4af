"""High-level DAG tensor for stencil dependency analysis.

Rebuild of /root/reference/src/soda/tensor.py: one Tensor per input /
local / output statement (after iterate-unrolling), carrying store ref,
expression, parent/child edges and load-ref tables used by the reuse
analysis and all backends.
"""

from __future__ import annotations

import collections
import copy
from functools import cached_property

from soda_tpu import utils
from soda_tpu.ir import nodes as ir


class Tensor:
  """See reference tensor.py:14-147 for the original field semantics.

  Attributes:
    dtype: element Type.
    parents / children: name -> Tensor.
    st_ref: store Ref (None for inputs).
    lets / expr: computation (empty/None for inputs).
    ld_refs: name -> list of loaded Refs (sorted by serialized offset).
    produce_offset / consume_offset / max_access: reuse-schedule results,
      set by Stencil.tensors (the LP at stencil.py).
  """

  def __init__(self, stmt, tile_size):
    self.dtype = stmt.dtype
    self._tile_size = tuple(tile_size)
    if hasattr(stmt, 'ref') and stmt.ref is not None:  # local/output stmt
      self.st_ref = copy.copy(stmt.ref)
      self.st_ref.parent = self
      self.lets = tuple(stmt.let)
      self.expr = stmt.expr
    elif hasattr(stmt, 'tile_size'):  # input stmt
      self._name = stmt.name
      self.st_ref = None
      self.lets = ()
      self.expr = None
    else:
      raise utils.InternalError('cannot initialize a Tensor from %s' %
                                type(stmt))
    self.parents = collections.OrderedDict()
    self.children = collections.OrderedDict()
    self.ld_refs = collections.OrderedDict()
    self.produce_offset = 0
    self.consume_offset = 0
    self.max_access = 0

  @property
  def name(self) -> str:
    if self.st_ref is not None:
      return self.st_ref.name
    return self._name

  @property
  def st_idx(self):
    if self.st_ref is not None:
      return self.st_ref.idx
    return (0,) * len(self._tile_size)

  @property
  def st_offset(self) -> int:
    return utils.serialize(self.st_idx, self._tile_size)

  @cached_property
  def ld_indices(self):
    return collections.OrderedDict(
        (name, collections.OrderedDict((ref.idx, ref) for ref in refs))
        for name, refs in self.ld_refs.items())

  @cached_property
  def ld_offsets(self):
    return collections.OrderedDict(
        (name,
         collections.OrderedDict(
             (utils.serialize(ref.idx, self._tile_size), ref)
             for ref in refs)) for name, refs in self.ld_refs.items())

  def propagate_type(self):
    if self.expr is None:
      return
    var_types = {let.name: let.dtype for let in self.lets}

    def visit_dtype(obj, args):
      if obj.dtype is None and isinstance(obj, ir.Var):
        obj.dtype = var_types.get(obj.name)
      return obj

    self.lets = tuple(l.visit(visit_dtype) for l in self.lets)
    self.expr = self.expr.visit(visit_dtype)
    self.st_ref = self.st_ref.visit(visit_dtype)

  def mutate(self, callback, args=None):
    self.lets = tuple(l.visit(callback, args) for l in self.lets)
    self.expr = self.expr.visit(callback, args)
    self.st_ref = self.st_ref.visit(callback, args)

  def visit_loads(self, callback, args=None):
    for let in self.lets:
      let.visit(callback, args)
    self.expr.visit(callback, args)

  def __str__(self):
    return ('Tensor\n  {dtype}: {name} = {expr}\n  store: {st_ref}\n'
            '  parents: {parents}\n  children: {children}').format(
                name=self.name, dtype=self.dtype, expr=self.expr,
                parents=utils.idx2str(self.parents),
                children=utils.idx2str(self.children), st_ref=self.st_ref)

  def is_output(self) -> bool:
    return len(self.children) == 0

  def is_input(self) -> bool:
    return len(self.parents) == 0

  def is_producer(self) -> bool:
    return not self.is_output()

  def is_consumer(self) -> bool:
    return not self.is_input()
