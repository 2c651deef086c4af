"""Grouped Pallas execution: the ``cluster`` granularity knob.

The reference's ``cluster`` pass controls how dataflow modules merge
into HLS functions (cluster.py:51-202). On TPU the analog is a backend
fusion decision: ``none``/``full`` fuse every stage into ONE Pallas
kernel (values through registers/VMEM); ``coarse``/``fine`` run one
fused kernel per stage group, chaining full-size arrays through HBM —
the debugging / VMEM-pressure-relief mode.

Each group is materialized as a self-contained sub-Stencil whose
inputs are the group's external parents, so every group reuses the
ordinary PallasExecutor. Correctness composes exactly like
``materialized_margins``: a group leaves garbage only in cells all
downstream consumers also treat as invalid.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Mapping, Optional, Tuple

import numpy as np

from soda_tpu import utils
from soda_tpu.backend import semantics
from soda_tpu.backend.pallas_kernel import PallasExecutor, _prepare_args
from soda_tpu.backend.plan import make_plan, validate_grid
from soda_tpu.core.stencil import Stencil
from soda_tpu.frontend import ast


def group_stencil(stencil, group, index: int) -> Stencil:
  """Build a self-contained Stencil computing one stage group.

  Group inputs are every tensor the group loads but does not produce;
  group outputs are stages consumed outside the group (or program
  outputs). ``border`` is always ``ignore`` — preserve fix-ups apply
  once, at the whole-program level.
  """
  produced = {stage.name for stage in group}
  external: List[str] = []
  for stage in group:
    for parent in stage.tensor.ld_refs:
      if (parent not in produced and parent not in external and
          parent not in stencil.param_names):
        external.append(parent)
  outputs = set(stencil.output_names)
  consumed_outside = set()
  for other in stencil.chronological_tensors:
    if other.name in produced:
      continue
    consumed_outside.update(n for n in other.ld_refs if n in produced)

  input_stmts = [
      # iterate clones (name_iterN) are tensors, not statements, so
      # dtype comes from the tensor table
      ast.InputStmt(dtype=stencil.tensors[name].dtype, name=name,
                    tile_size=stencil.tile_size[:-1], dram=())
      for name in external
  ]
  local_stmts, output_stmts = [], []
  for stage in group:
    t = stage.tensor
    kwargs = dict(ref=copy.copy(t.st_ref), dtype=t.dtype, expr=t.expr,
                  let=t.lets)
    # dead locals (no consumers anywhere — legal DSL) must still be
    # a sub-stencil output so the group has one; the value is simply
    # never read downstream
    dead = not t.children and t.name not in outputs
    if t.name in outputs or t.name in consumed_outside or dead:
      if t.name in consumed_outside and t.children and any(
          c in produced for c in t.children):
        raise utils.InternalError(
            'stage %s is consumed both inside and outside its group' %
            t.name)
      output_stmts.append(ast.OutputStmt(dram=(), **kwargs))
    else:
      local_stmts.append(ast.LocalStmt(**kwargs))
  return Stencil(
      app_name='%s_g%d' % (stencil.app_name, index),
      border='ignore', cluster='none', iterate=1,
      burst_width=stencil.burst_width,
      unroll_factor=stencil.unroll_factor,
      tile_size=stencil.tile_size, dim=stencil.dim,
      input_stmts=input_stmts, local_stmts=local_stmts,
      output_stmts=output_stmts, param_stmts=list(stencil.param_stmts),
      optimizations={})


class GroupedPallasExecutor:
  """Run a stencil as one fused Pallas kernel per plan group."""

  def __init__(self, stencil, shape: Tuple[int, ...],
               cluster: Optional[str] = None,
               apply_preserve_border: bool = True, **kwargs):
    import jax
    import jax.numpy as jnp
    self.stencil = stencil
    self.shape = tuple(shape)
    # per-group sub-stencils see their group inputs as margin-zero, so
    # the per-executor checks below do NOT compose to the full window —
    # validate against the ORIGINAL stencil's cumulative margins here
    validate_grid(stencil, self.shape)
    plan = make_plan(stencil, cluster or stencil.cluster or 'coarse')
    self.plan = plan
    self.executors: List[Tuple[Stencil, PallasExecutor]] = []
    for gi, group in enumerate(plan.groups):
      sub = group_stencil(stencil, group, gi)
      self.executors.append((sub, PallasExecutor(sub, self.shape,
                                                 **kwargs)))
    self.interpret = self.executors[0][1].interpret
    n_in = len(stencil.input_names)
    param_names = stencil.param_names

    def fn(*arrays):
      env: Dict[str, object] = dict(
          zip(stencil.input_names, arrays[:n_in]))
      params = dict(zip(param_names, arrays[n_in:]))
      for sub, ex in self.executors:
        args = [env[name] for name in sub.input_names]
        args += [params[name] for name in sub.param_names]
        outs = ex.fn(*args)
        env.update(zip(sub.output_names, outs))
      outs = tuple(env[name] for name in stencil.output_names)
      # the sharded layer owns the global border fix-up; a per-shard
      # one would use the shard-local (wrong) boundary
      if stencil.preserve_border and apply_preserve_border:
        from soda_tpu.backend.reference import preserve_border_fixup
        in_pos = {n: i for i, n in enumerate(stencil.input_names)}
        fixed = preserve_border_fixup(
            jnp, stencil, self.shape, lambda n: arrays[in_pos[n]],
            dict(zip(stencil.output_names, outs)))
        outs = tuple(fixed[n] for n in stencil.output_names)
      return outs

    self._fn = jax.jit(fn)

  @property
  def fn(self):
    """Jitted positional callable: fn(*inputs, *params) -> outputs."""
    return self._fn

  def prepare(self, inputs: Mapping[str, np.ndarray],
              params: Optional[Mapping[str, np.ndarray]] = None):
    return _prepare_args(self, inputs, params)

  def __call__(self, inputs, params=None) -> Dict[str, np.ndarray]:
    outs = self._fn(*self.prepare(inputs, params))
    return dict(zip(self.stencil.output_names, outs))
