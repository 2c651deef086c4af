"""NumPy reference executor: the framework's correctness oracle.

Plays the role of the reference's generated scalar CPU check
(/root/reference/src/soda/codegen/frt/host.py:558-660 — the
``SODA_TEST_MAIN`` loop nest): every non-input tensor is produced in
chronological order over the full grid, each one restricted to its own
valid region computed from the overall stencil window, with C arithmetic
semantics (see soda_tpu.backend.semantics).

Index convention: arrays are indexed ``a[i0, i1, ..., i_{dim-1}]`` where
``i_d`` is DSL dimension ``d`` (dimension 0 first, streaming dimension
last) — identical to the logical indexing of the DSL. Cells outside a
tensor's valid region stay zero (the reference's host buffers are
value-initialized, host.py:476).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from soda_tpu import utils
from soda_tpu.backend import semantics
from soda_tpu.core import stencil as core
from soda_tpu.core.tensor import Tensor
from soda_tpu.ir import nodes as ir


def tensor_valid_margins(stencil, tensor: Tensor
                         ) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
  """Per-dimension (lo, hi) margins outside which ``tensor`` is undefined.

  Mirrors the loop bounds of the reference CPU check
  (frt/host.py:566-577): locals use the window w.r.t. their direct
  parents; outputs use the overall window w.r.t. the original inputs.
  """
  if tensor.is_input():
    dim = len(stencil.tile_size)
    return (0,) * dim, (0,) * dim
  if tensor.is_output():
    sources = tuple(map(stencil.tensors.get, stencil.input_names))
  else:
    sources = tuple(tensor.parents.values())
  window = core.get_overall_stencil_window(sources, tensor)
  stencil_dim = core.get_stencil_dim(window)
  offset = core.get_stencil_window_offset(window)
  lo = tuple(max(0, offset[d]) for d in range(len(stencil_dim)))
  hi = tuple(
      max(0, stencil_dim[d] - offset[d] - 1) for d in range(len(stencil_dim)))
  return lo, hi


def output_valid_slices(stencil, dims: Tuple[int, ...],
                        name: Optional[str] = None) -> Tuple[slice, ...]:
  """Slices of the valid (comparable) region of an output tensor."""
  tensor = stencil.tensors[name or stencil.output_names[0]]
  lo, hi = tensor_valid_margins(stencil, tensor)
  return tuple(
      slice(lo[d], dims[d] - hi[d]) for d in range(len(dims)))


class ReferenceExecutor:
  """Interprets the stencil tensor DAG with NumPy.

  Usage::

    ref = ReferenceExecutor(stencil)
    outs = ref.run({'input': arr})            # dict name -> full array
    region = output_valid_slices(stencil, arr.shape)
  """

  def __init__(self, stencil):
    self.stencil = stencil

  def run(self,
          inputs: Mapping[str, np.ndarray],
          params: Optional[Mapping[str, np.ndarray]] = None,
          return_locals: bool = False) -> Dict[str, np.ndarray]:
    stencil = self.stencil
    params = dict(params or {})
    arrays: Dict[str, np.ndarray] = {}
    dims: Optional[Tuple[int, ...]] = None
    for name in stencil.input_names:
      if name not in inputs:
        raise utils.InputError('missing input: %s' % name)
      arr = np.asarray(inputs[name])
      dtype = stencil.symbol_table[name]
      arrays[name] = semantics.wrap(np, arr, dtype)
      if dims is None:
        dims = arr.shape
      elif arr.shape != dims:
        raise utils.InputError(
            'input %s shape %s != %s' % (name, arr.shape, dims))
    assert dims is not None
    if len(dims) != len(stencil.tile_size):
      raise utils.InputError(
          'expected %d-D input, got %d-D' % (len(stencil.tile_size),
                                             len(dims)))

    for tensor in stencil.chronological_tensors:
      if tensor.is_input():
        continue
      arrays[tensor.name] = self._produce(tensor, arrays, params, dims)

    if return_locals:
      return arrays
    return {name: arrays[name] for name in stencil.output_names}

  def _produce(self, tensor: Tensor, arrays, params, dims) -> np.ndarray:
    stencil = self.stencil
    lo, hi = tensor_valid_margins(stencil, tensor)
    region = tuple(
        slice(lo[d], dims[d] - hi[d]) for d in range(len(dims)))
    st_idx = tensor.st_idx

    def load(ref: ir.Ref):
      if ref.name in stencil.param_names:
        return params[ref.name][tuple(ref.idx)]
      src = arrays[ref.name]
      window = tuple(
          slice(region[d].start + ref.idx[d] - st_idx[d],
                region[d].stop + ref.idx[d] - st_idx[d])
          for d in range(len(dims)))
      return src[window]

    def param(name, idx):
      return params[name][idx]

    evaluator = semantics.Evaluator(np, load, param=param)
    value, _ = evaluator.eval_stmt(tensor)
    out = np.zeros(dims, dtype=tensor.dtype.np_dtype)
    out[region] = semantics.wrap(np, value, tensor.dtype)
    return out


def run(stencil, inputs, params=None, **kwargs) -> Dict[str, np.ndarray]:
  return ReferenceExecutor(stencil).run(inputs, params, **kwargs)


def make_test_inputs(stencil, dims: Tuple[int, ...],
                     seed: int = 0) -> Dict[str, np.ndarray]:
  """Generate inputs like the reference self-test does: ``p+q+...`` ramps
  for integer tensors, uniform [0, 1) for floats (frt/host.py:513-528)."""
  rng = np.random.default_rng(seed)
  inputs: Dict[str, np.ndarray] = {}
  for name in stencil.input_names:
    dtype = stencil.symbol_table[name]
    if dtype.is_float:
      inputs[name] = rng.random(dims).astype(dtype.np_dtype)
    else:
      ramp = np.zeros(dims, dtype=np.int64)
      for d in range(len(dims)):
        shape = [1] * len(dims)
        shape[d] = dims[d]
        ramp = ramp + np.arange(dims[d], dtype=np.int64).reshape(shape)
      inputs[name] = semantics.wrap(np, ramp, dtype)
  return inputs


def make_test_params(stencil, seed: int = 1):
  rng = np.random.default_rng(seed)
  params = {}
  for stmt in stencil.param_stmts:
    size = tuple(stmt.size)
    if stmt.dtype.is_float:
      params[stmt.name] = rng.random(size).astype(stmt.dtype.np_dtype)
    else:
      ramp = np.zeros(size, dtype=np.int64)
      for d in range(len(size)):
        shape = [1] * len(size)
        shape[d] = size[d]
        ramp = ramp + np.arange(size[d], dtype=np.int64).reshape(shape)
      params[stmt.name] = semantics.wrap(np, ramp, stmt.dtype)
  return params
