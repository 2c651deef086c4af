"""Multi-chip stencil execution: mesh sharding + ICI halo exchange.

The TPU-native replacement for the reference's multi-DRAM-bank data
partitioning and host-side halo-overlapped tiling
(/root/reference/docs/data-layout.md:62-255, codegen/xilinx/host.py:641-701):
the grid's streaming dimension is sharded across a 1-D device mesh via
``jax.shard_map``; each step exchanges halo rows with mesh neighbors
over ICI using ``lax.ppermute`` and runs the local stencil pipeline on
its extended shard. Halo width is the OVERALL stencil window
(transitive input->output, reference core.py:876-919), so multi-stage
and iterate>1 kernels exchange once per step, not once per stage.

Devices at the global boundary receive zero halos (ppermute's
non-participating edge), which lands only in the globally-invalid
border region — identical semantics to the single-chip executors.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from soda_tpu import utils
from soda_tpu.backend import semantics
from soda_tpu.backend.plan import make_plan


class ShardedExecutor:
  """Run a stencil over a device mesh, sharded along the streaming axis.

  Args:
    stencil: a core.Stencil.
    global_shape: full grid shape (array-axis order).
    mesh: a jax.sharding.Mesh with one axis (default: all devices on
      axis 'x').
    inner: 'xla' (shifted-slice stages, default) or 'pallas' (each
      shard runs the fused Pallas kernel).
  """

  def __init__(self, stencil, global_shape: Tuple[int, ...],
               mesh=None, inner: str = 'xla',
               interpret: Optional[bool] = None):
    import jax
    from jax import lax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    self.stencil = stencil
    self.shape = tuple(global_shape)
    self.plan = make_plan(stencil, 'full')
    dim = self.plan.dim
    if mesh is None:
      devices = np.array(jax.devices())
      mesh = Mesh(devices, ('x',))
    if len(mesh.axis_names) != 1:
      raise utils.InputError('ShardedExecutor expects a 1-D mesh')
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    h = self.shape[0]
    if h % n_dev:
      raise utils.InputError(
          'streaming extent %d not divisible by mesh size %d' % (h, n_dev))
    h_loc = h // n_dev
    lo = self.plan.halo_lo[dim - 1]
    hi = self.plan.halo_hi[dim - 1]
    if lo >= h_loc or hi >= h_loc:
      raise utils.InputError('halo (%d, %d) exceeds shard rows %d' %
                             (lo, hi, h_loc))
    self.mesh = mesh
    rest = self.shape[1:]
    ext_shape = (h_loc + lo + hi,) + rest
    stencil_ref = stencil
    plan = self.plan
    input_names = stencil.input_names
    param_names = stencil.param_names
    output_names = stencil.output_names

    if inner == 'pallas':
      from soda_tpu.backend.pallas_kernel import PallasExecutor
      inner_exec = PallasExecutor(stencil, ext_shape, interpret=interpret)

      def run_local(arrays: Dict, params: Dict) -> Dict:
        args = [arrays[name] for name in input_names]
        args += [params[name] for name in param_names]
        outs = inner_exec._fn(*args)
        return dict(zip(output_names, outs))
    else:
      from soda_tpu.backend import xla as xla_backend

      def run_local(arrays: Dict, params: Dict) -> Dict:
        return xla_backend.forward(stencil_ref, arrays, params, ext_shape,
                                   plan)

    fwd = [(i, i + 1) for i in range(n_dev - 1)]  # to next (halo_lo src)
    bwd = [(i + 1, i) for i in range(n_dev - 1)]  # to prev (halo_hi src)

    def step(*local_arrays):
      arrays = {}
      for name, a in zip(input_names, local_arrays[:len(input_names)]):
        parts = []
        if lo:
          # my halo_lo rows = last lo rows of the previous device
          parts.append(lax.ppermute(a[-lo:], axis, fwd))
        parts.append(a)
        if hi:
          # my halo_hi rows = first hi rows of the next device
          parts.append(lax.ppermute(a[:hi], axis, bwd))
        arrays[name] = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else a
      params = dict(
          zip(param_names, local_arrays[len(input_names):]))
      outs = run_local(arrays, params)
      return tuple(outs[name][lo:lo + h_loc] for name in output_names)

    in_specs = tuple([P(axis)] * len(input_names) +
                     [P()] * len(param_names))
    out_specs = tuple([P(axis)] * len(output_names))
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker would otherwise reject
    sharded = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
    self._fn = jax.jit(sharded)
    self._jnp = jnp

  def prepare(self, inputs: Mapping, params: Optional[Mapping] = None):
    """Wrap + device-put arguments in positional order."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    jnp = self._jnp
    stencil = self.stencil
    (axis,) = self.mesh.axis_names
    args = []
    for name in stencil.input_names:
      arr = semantics.wrap(jnp, jnp.asarray(inputs[name]),
                           stencil.symbol_table[name])
      args.append(
          jax.device_put(arr, NamedSharding(self.mesh, P(axis))))
    params = dict(params or {})
    for name in stencil.param_names:
      args.append(
          jax.device_put(jnp.asarray(params[name]),
                         NamedSharding(self.mesh, P())))
    return tuple(args)

  def __call__(self, inputs: Mapping, params: Optional[Mapping] = None
               ) -> Dict[str, np.ndarray]:
    outs = self._fn(*self.prepare(inputs, params))
    return dict(zip(self.stencil.output_names, outs))
