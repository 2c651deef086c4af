"""Stencil core: the semantic heart of the compiler.

Rebuild of /root/reference/src/soda/core.py (the ``Stencil`` class):
tensor DAG construction with iterate-unrolling (core.py:307-456), the
optimal reuse-buffer scheduling LP (ILP #1, core.py:371-426 — here solved
exactly with scipy's HiGHS; the constraint matrix is a difference system,
so LP relaxation is integral), reuse-chain / reuse-buffer / points math
(core.py:684-795), and the overall stencil-window analytics
(core.py:858-926) that drive valid-region and halo computation on TPU.
"""

from __future__ import annotations

import collections
import itertools
import logging
import operator
from functools import cached_property
from typing import Dict, List, Optional, Tuple

import numpy as np

from soda_tpu import utils
from soda_tpu.core.tensor import Tensor
from soda_tpu.ir import arithmetic, nodes as ir
from soda_tpu.ir import visitor as ir_visitor
from soda_tpu.ir.types import Type

_logger = logging.getLogger().getChild(__name__)


class Stencil:
  """See reference core.py:25-51 for the attribute inventory."""

  def __init__(self, **kwargs):
    self.iterate = kwargs.pop('iterate')
    if self.iterate < 1:
      raise utils.SemanticError('cannot iterate %d times' % self.iterate)
    self.border = kwargs.pop('border', None) or 'ignore'
    self.preserve_border = self.border == 'preserve'
    self.cluster = kwargs.pop('cluster', None) or 'none'
    self.burst_width = kwargs.pop('burst_width')
    self.app_name = kwargs.pop('app_name')
    self.tile_size = tuple(kwargs.pop('tile_size'))
    self.unroll_factor = kwargs.pop('unroll_factor')
    self.replication_factor = kwargs.pop('replication_factor', 1)
    self.dim = kwargs.pop('dim', len(self.tile_size))
    self.param_stmts = list(kwargs.pop('param_stmts', ()))
    self.input_stmts = list(kwargs.pop('input_stmts'))
    self.local_stmts = list(kwargs.pop('local_stmts', ()))
    self.output_stmts = list(kwargs.pop('output_stmts'))
    self.optimizations = dict(kwargs.pop('optimizations', {}) or {})

    # dram bank overrides, `name:bank.bank^name:bank` syntax
    # (reference core.py:78-106)
    dram_in = kwargs.pop('dram_in', None)
    if dram_in is not None:
      if ':' in dram_in:
        input_stmt_map = {s.name: s for s in self.input_stmts}
        for dram_map in dram_in.split('^'):
          var_name, bank_list = dram_map.split(':')
          if var_name not in input_stmt_map:
            raise utils.SemanticError('no input named `%s`' % var_name)
          input_stmt_map[var_name].dram = tuple(
              map(int, bank_list.split('.')))
      else:
        for input_stmt in self.input_stmts:
          input_stmt.dram = tuple(map(int, dram_in.split('.')))
    dram_out = kwargs.pop('dram_out', None)
    if dram_out is not None:
      if ':' in dram_out:
        output_stmt_map = {s.name: s for s in self.output_stmts}
        for dram_map in dram_out.split(','):
          var_name, bank_list = dram_map.split(':')
          if var_name not in output_stmt_map:
            raise utils.SemanticError('no output named `%s`' % var_name)
          output_stmt_map[var_name].dram = tuple(
              map(int, bank_list.split('.')))
      else:
        for output_stmt in self.output_stmts:
          output_stmt.dram = tuple(map(int, dram_out.split('.')))
    kwargs.pop('_tx_position', None)

    if self.iterate > 1:
      if len(self.input_stmts) != len(self.output_stmts):
        raise utils.SemanticError(
            'number of input tensors must be the same as output if iterate '
            '> 1 times, currently there are %d input(s) but %d output(s)' %
            (len(self.input_stmts), len(self.output_stmts)))
      if self.input_types != self.output_types:
        raise utils.SemanticError(
            'input must have the same type(s) as output if iterate > 1 '
            'times, current input has type %s but output has type %s' %
            (utils.lst2str(self.input_types),
             utils.lst2str(self.output_types)))

    for stmt in itertools.chain(self.local_stmts, self.output_stmts):
      stmt.stencil = self
      stmt.expr = arithmetic.simplify(stmt.expr)
      stmt.let = arithmetic.simplify(stmt.let)

    # pass pipeline: CR -> inline (opt-in) -> rebalance (reference
    # core.py:134-139); cluster on TPU is a backend fusion knob, not an
    # IR pass, and is consumed by soda_tpu.backend.plan.
    self._cr_counter = 0
    from soda_tpu.optimization import computation_reuse as cr
    from soda_tpu.optimization import inline
    cr.computation_reuse(self)
    if 'inline' in self.optimizations:
      inline.inline(self)
    if 'distribute' in self.optimizations:
      # factor shared numeric coefficients: a*c + b*c -> (a + b) * c
      # (reassociation; bit-exact only for ints — floats stay within
      # the reference THRESHOLD)
      for stmt in itertools.chain(self.local_stmts, self.output_stmts):
        stmt.expr = arithmetic.simplify(
            arithmetic.reverse_distribute(stmt.expr))
    inline.rebalance(self)

    for stmt in itertools.chain(self.local_stmts, self.output_stmts):
      stmt.propagate_type()

  def __str__(self) -> str:
    stmts = (self.input_stmts + self.param_stmts + self.local_stmts +
             self.output_stmts)
    return ('kernel: {0.app_name}\nburst width: {0.burst_width}\n'
            'iterate: {0.iterate}\nunroll factor: {0.unroll_factor}\n'
            '{stmts}\nborder: {0.border}\ncluster: {0.cluster}').format(
                self, stmts='\n'.join(map(str, stmts)))

  # -- naming / symbol tables -------------------------------------------------
  @property
  def kernel_name(self) -> str:
    return f'{self.app_name}_kernel'

  def new_cr_var(self) -> str:
    while True:
      var = 'cr_var_%d' % self._cr_counter
      self._cr_counter += 1
      if var not in {
          stmt.name
          for stmt in self.input_stmts + self.local_stmts + self.output_stmts
      }:
        return var

  @cached_property
  def stmt_table(self) -> Dict[str, ir.Node]:
    return {
        stmt.name: stmt for stmt in self.input_stmts + self.local_stmts +
        self.output_stmts + self.param_stmts
    }

  @cached_property
  def input_types(self):
    return tuple(s.dtype for s in self.input_stmts)

  @cached_property
  def param_types(self):
    return tuple(s.dtype for s in self.param_stmts)

  @cached_property
  def local_types(self):
    return tuple(s.dtype for s in self.local_stmts)

  @cached_property
  def output_types(self):
    return tuple(s.dtype for s in self.output_stmts)

  @cached_property
  def input_names(self):
    return tuple(s.name for s in self.input_stmts)

  @cached_property
  def param_names(self):
    return tuple(s.name for s in self.param_stmts)

  @cached_property
  def local_names(self):
    return tuple(s.name for s in self.local_stmts)

  @cached_property
  def output_names(self):
    return tuple(s.name for s in self.output_stmts)

  @cached_property
  def symbol_table(self) -> Dict[str, Type]:
    symbol_table: Dict[str, Type] = {}
    for name, dtype in zip(
        itertools.chain(self.input_names, self.local_names,
                        self.output_names),
        itertools.chain(self.input_types, self.local_types,
                        self.output_types)):
      if name in symbol_table:
        raise utils.InputError('conflicting stmt name: %s' % name)
      symbol_table[name] = dtype
    for stmt in self.param_stmts:
      symbol_table[stmt.name] = stmt.dtype
    return symbol_table

  @property
  def propagate_type(self):
    """Callable propagating types, optionally with a stmt's let scope
    (reference core.py:258-274)."""

    def propagate_type(node, stmt=None):
      table = self.symbol_table if stmt is None else stmt.symbol_table
      return arithmetic.propagate_type(node, table)

    return propagate_type

  @cached_property
  def norm_refs(self) -> Dict[str, Tuple[int, ...]]:
    """Per-stmt normalization index (reference core.py:276-305)."""
    norm_refs: Dict[str, Tuple[int, ...]] = {}

    def get_norm_idx(stmt) -> Tuple[int, ...]:
      norm_idx = norm_refs.get(stmt.name)
      if norm_idx is None:
        loads = ir_visitor.get_load_tuple(stmt.expr)
        for let in stmt.let:
          loads += ir_visitor.get_load_tuple(let)

        def all_indices():
          for load in loads:
            if load.name in self.input_names:
              yield load.idx
            else:
              yield tuple(
                  x + y for x, y in zip(
                      load.idx, get_norm_idx(self.stmt_table[load.name])))

        norm_idx = tuple(x - y for x, y in zip(
            min(all_indices(), key=lambda idx: tuple(reversed(tuple(idx)))),
            stmt.ref.idx))
        norm_refs[stmt.name] = norm_idx
      return norm_idx

    for stmt in self.local_stmts + self.output_stmts:
      get_norm_idx(stmt)
    return norm_refs

  # -- tensor DAG ---------------------------------------------------------------
  @cached_property
  def tensors(self) -> 'collections.OrderedDict[str, Tensor]':
    """Builds the high-level DAG, unrolling ``iterate`` into a deeper
    pipeline (reference core.py:307-456) and solving the reuse LP."""
    tensor_map: 'collections.OrderedDict[str, Tensor]' = \
        collections.OrderedDict()
    for stmt in self.input_stmts:
      tensor_map[stmt.name] = Tensor(stmt, self.tile_size)

    def name_in_iter(name: str, iteration: int) -> str:
      if name in self.input_names:
        return name + '_iter%d' % iteration if iteration > 0 else name
      if name in self.output_names:
        if iteration < self.iterate - 1:
          return (self.input_names[self.output_names.index(name)] +
                  '_iter%d' % (iteration + 1))
        return name
      if name in self.local_names:
        return name + '_iter%d' % iteration if iteration > 0 else name
      if name in self.param_names:
        return name
      raise utils.InternalError('unknown name: %s' % name)

    for iteration in range(self.iterate):

      def mutate_name_callback(obj, _):
        if isinstance(obj, ir.Ref):
          obj.dtype = self.symbol_table[obj.name]
          obj.name = name_in_iter(obj.name, iteration)  # noqa: B023
        return obj

      tensors = []
      for stmt in itertools.chain(self.local_stmts, self.output_stmts):
        tensor = Tensor(stmt.visit(mutate_name_callback), self.tile_size)
        tensor_map[tensor.name] = tensor
        tensors.append(tensor)

      for tensor in tensors:
        tensor.propagate_type()
        loads = ir_visitor.get_load_dict(tensor)
        for parent_name, ld_refs in loads.items():
          if parent_name in self.param_names:
            continue
          ld_refs = sorted(
              ld_refs,
              key=lambda ref: utils.serialize(ref.idx, self.tile_size))
          parent_tensor = tensor_map[parent_name]
          parent_tensor.children[tensor.name] = tensor
          tensor.parents[parent_name] = parent_tensor
          tensor.ld_refs[parent_name] = ld_refs

    self._solve_reuse_offsets(tensor_map)
    return tensor_map

  def _solve_reuse_offsets(self, tensor_map) -> None:
    """ILP #1: optimal reuse-buffer offsets (reference core.py:371-426).

    Variables: produced_T (p) and consumed_T (q) per tensor; minimize
    total reuse distance sum(q - p) subject to
      q_T >= p_T
      p_ld <= p_st + (st_offset - newest_access)   per DAG edge
      q_ld >= p_st + (st_offset - oldest_access)   per DAG edge
    The constraint matrix is a difference system, so the LP optimum is
    integral; solved with scipy HiGHS.
    """
    from scipy.optimize import linprog

    names = list(tensor_map)
    n = len(names)
    index = {name: i for i, name in enumerate(names)}
    # x = [p_0..p_{n-1}, q_0..q_{n-1}]
    c = np.zeros(2 * n)
    c[:n] = -1.0
    c[n:] = 1.0
    a_ub: List[np.ndarray] = []
    b_ub: List[float] = []

    def add_le(coeffs, bound):  # sum(coeff*x) <= bound
      row = np.zeros(2 * n)
      for var, co in coeffs:
        row[var] += co
      a_ub.append(row)
      b_ub.append(float(bound))

    for name in names:
      i = index[name]
      add_le([(i, 1.0), (n + i, -1.0)], 0.0)  # p_T - q_T <= 0
    for st in tensor_map.values():
      for ld_name, offsets in st.ld_offsets.items():
        oldest, newest = min(offsets), max(offsets)
        i_ld, i_st = index[ld_name], index[st.name]
        add_le([(i_ld, 1.0), (i_st, -1.0)], st.st_offset - newest)
        add_le([(i_st, 1.0), (n + i_ld, -1.0)], -(st.st_offset - oldest))

    bounds = [(None, None)] * (2 * n)
    bounds[index[self.input_names[0]]] = (0, 0)  # reference point
    res = linprog(c, A_ub=np.array(a_ub), b_ub=np.array(b_ub),
                  bounds=bounds, method='highs')
    if not res.success:
      raise utils.InternalError('unexpected LP status: %s' % res.message)
    p = np.rint(res.x[:n]).astype(int)
    q = np.rint(res.x[n:]).astype(int)
    total_distance = int((q - p).sum())
    _logger.info('total reuse distance: %d', total_distance)
    self.total_reuse_distance = total_distance

    base = min(p[index[name]] for name in self.input_names)
    for name, tensor in tensor_map.items():
      tensor.produce_offset = int(p[index[name]] - base)
      tensor.consume_offset = int(q[index[name]] - base)
      tensor.max_access = 0
    for ld in tensor_map.values():
      for st in ld.children.values():
        oldest_access = (st.st_offset - min(st.ld_offsets[ld.name]) +
                         st.produce_offset - ld.produce_offset)
        ld.max_access = max(ld.max_access, oldest_access)

  @cached_property
  def chronological_tensors(self) -> List[Tensor]:
    return list(
        map(
            self.tensors.get,
            utils.toposort_flatten(
                {
                    t.name: set(t.parents)
                    for t in self.tensors.values()
                },
                sort=False)))

  @cached_property
  def producer_tensors(self) -> Tuple[Tensor, ...]:
    return tuple(filter(Tensor.is_producer, self.tensors.values()))

  @cached_property
  def consumer_tensors(self) -> Tuple[Tensor, ...]:
    return tuple(filter(Tensor.is_consumer, self.tensors.values()))

  @cached_property
  def pixel_width_i(self):
    return [t.width_in_bits for t in self.input_types]

  @cached_property
  def pixel_width_o(self):
    return [t.width_in_bits for t in self.output_types]

  # -- reuse buffers (ICCAD'18 line-buffer math, core.py:505-563) ----------------
  @cached_property
  def reuse_buffers(self):
    unroll_factor = self.unroll_factor
    self._reuse_buffer_lengths = {}
    reuse_buffers = {}
    for tensor in self.producer_tensors:
      reuse_buffer = _get_reuse_buffer(self.tile_size, tensor, unroll_factor)
      reuse_buffer_length = {}
      reuse_buffers[tensor.name] = reuse_buffer
      self._reuse_buffer_lengths[tensor.name] = reuse_buffer_length
      first = [True] * unroll_factor
      for start, end in reuse_buffer[1:]:
        if first[start % unroll_factor]:
          first[start % unroll_factor] = False
          if start >= unroll_factor:
            reuse_buffer_length[end] = end // unroll_factor
            continue
        reuse_buffer_length[end] = (end - start) // unroll_factor
    return reuse_buffers

  @cached_property
  def all_points(self):
    return {
        tensor.name: _get_points(self.tile_size, tensor, self.unroll_factor)
        for tensor in self.producer_tensors
    }

  @cached_property
  def next_fifo(self):
    next_fifo = {}
    for name, reuse_buffer in self.reuse_buffers.items():
      next_fifo[name] = {}
      for start, end in reuse_buffer[1:]:
        if start < end:
          next_fifo[name][start] = end
    return next_fifo

  @cached_property
  def reuse_buffer_lengths(self):
    self.reuse_buffers  # noqa: B018 - populate
    return self._reuse_buffer_lengths

  # -- stencil window analytics -------------------------------------------------
  def _calculate_stencil_window(self) -> None:
    stencil_window = get_overall_stencil_window(
        map(self.tensors.get, self.input_names),
        self.tensors[self.output_names[0]])
    stencil_distance = get_stencil_distance(stencil_window, self.tile_size)
    stencil_offset = stencil_distance - utils.serialize(
        get_stencil_window_offset(stencil_window), self.tile_size)
    self._stencil_window = stencil_window
    self._stencil_distance = max(stencil_distance, stencil_offset)

  @property
  def stencil_distance(self) -> int:
    if not hasattr(self, '_stencil_distance'):
      self._calculate_stencil_window()
    return self._stencil_distance

  @property
  def stencil_window(self):
    if not hasattr(self, '_stencil_window'):
      self._calculate_stencil_window()
    return self._stencil_window

  @property
  def meta_lines(self) -> Tuple[str, ...]:
    return (
        '# this program can be generated from the following SODA DSL',
        '"""\n%s\n"""' % self,
        '',
        '# stencil window size: %s' %
        (tuple(get_stencil_dim(self.stencil_window)),),
        '# stencil distance: %s' % self.stencil_distance,
        '',
    )


# -- module-level window/reuse math (reference core.py:684-926) -----------------
def _get_reuse_chains(tile_size, tensor, unroll_factor):
  """Partition the unrolled access-offset set A-dagger into unroll_factor
  chains by offset mod unroll (reference core.py:684-725)."""

  def unroll_offsets(child):
    unrolled_offsets = set()
    for unroll_idx in range(unroll_factor):
      for offset in child.ld_offsets[tensor.name]:
        unrolled_offsets.add(unroll_idx + child.st_offset - offset +
                             child.produce_offset - tensor.produce_offset)
    return unrolled_offsets

  a_dag = set()
  for child in tensor.children.values():
    a_dag |= unroll_offsets(child)

  chains = []
  for chain_idx in reversed(range(unroll_factor)):
    chains.append(
        tuple(
            sorted(offset for offset in a_dag
                   if offset % unroll_factor == chain_idx)))
  return chains


def _get_points(tile_size, tensor, unroll_factor):
  """(offset, unroll_idx) -> stencil-window point map
  (reference core.py:728-762)."""
  all_points = {}  # {name: {offset: {unroll_idx: point_idx}}}
  for child in tensor.children.values():
    all_points[child.name] = {}
    offsets = child.ld_offsets[tensor.name]
    for unroll_idx in range(unroll_factor):
      for idx, offset in enumerate(offsets):
        all_points[child.name].setdefault(
            unroll_idx + child.st_offset - offset + child.produce_offset -
            tensor.produce_offset, {})[unroll_factor - 1 - unroll_idx] = idx
  return all_points


def _get_reuse_buffer(tile_size, tensor, unroll_factor):
  """Convert chains to [length, (start, end)...] FIFO segments
  (reference core.py:765-795)."""
  reuse_buffer = [None]
  offsets = []
  for chain_id, chain in enumerate(
      _get_reuse_chains(tile_size, tensor, unroll_factor)):
    reuse_buffer.append((unroll_factor - 1 - chain_id, chain[0]))
    offsets.append(chain[0])
    for j in range(len(chain) - 1):
      reuse_buffer.append((chain[j], chain[j + 1]))
      offsets.append(chain[j + 1])
  reuse_buffer[0] = max(offsets) + 1
  return reuse_buffer


def get_indices_id(indices) -> str:
  return '_'.join(str(idx).replace('-', 'm') for idx in indices)


def get_stencil_distance(stencil_window, tile_size) -> int:
  return (max(utils.serialize_iter(stencil_window, tile_size)) +
          utils.serialize(get_stencil_window_offset(stencil_window),
                          tile_size))


def get_stencil_dim(points) -> List[int]:
  dimension = len(next(iter(points)))
  return [
      max_index - min_index + 1 for max_index, min_index in zip(
          [max(point[d] for point in points) for d in range(dimension)],
          [min(point[d] for point in points) for d in range(dimension)])
  ]


_overall_stencil_window_cache: Dict[Tuple[int, int], Tuple] = {}


def get_overall_stencil_window(input_tensor, output_tensor):
  """Transitive Minkowski-sum stencil window input->output, store index
  normalized to 0 (reference core.py:876-919)."""
  if isinstance(input_tensor, collections.abc.Iterable):
    return tuple(
        sorted(
            set.union(*(set(get_overall_stencil_window(t, output_tensor))
                        for t in input_tensor))))
  idx = (id(input_tensor), id(output_tensor))
  if idx in _overall_stencil_window_cache:
    return _overall_stencil_window_cache[idx]
  all_points = set()
  for name, points in output_tensor.ld_indices.items():
    if name != input_tensor.name:
      recursive_points = get_overall_stencil_window(
          input_tensor, output_tensor.parents[name])
      all_points |= set.union(*[{
          tuple(map(lambda a, b, c: a + b - c, p, point,
                    output_tensor.st_idx)) for p in recursive_points
      } for point in points])
    else:
      all_points |= {
          tuple(map(operator.sub, point, output_tensor.st_idx))
          for point in points
      }
  all_points = tuple(sorted(all_points))
  _overall_stencil_window_cache[idx] = all_points
  return all_points


def get_stencil_window_offset(stencil_window):
  # only works if window is normalized to store at 0
  return tuple(-min(p[d] for p in stencil_window)
               for d in range(len(next(iter(stencil_window)))))
