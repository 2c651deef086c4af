"""Execution backends.

- reference: NumPy oracle (C semantics, the correctness gold standard)
- xla:       whole-grid jitted stages (works at any size; XLA blocks)
- pallas:    one fused kernel streaming VMEM slabs (fastest; needs the
             cross-section to fit the VMEM budget)
- get_executor: auto-dispatch between them
"""

from __future__ import annotations

from typing import Optional, Tuple


def pallas_fits(stencil, shape: Tuple[int, ...],
                budget: Optional[int] = None) -> bool:
  """Whether the fused Pallas kernel's working set fits VMEM at the
  minimum block size."""
  from soda_tpu.backend import pallas_kernel
  from soda_tpu.backend.plan import make_plan
  plan = make_plan(stencil, 'full')
  if plan.dim < 2:
    return False
  b = pallas_kernel.choose_block_rows(
      plan, shape, budget or pallas_kernel._VMEM_BUDGET)
  # choose_block_rows returns its minimum even when over budget; verify
  lo = pallas_kernel._pad_to(plan.halo_lo[plan.dim - 1],
                             pallas_kernel._ALIGN)
  s = pallas_kernel._pad_to(b + lo + plan.halo_hi[plan.dim - 1],
                            pallas_kernel._ALIGN)
  est = plan.vmem_bytes((s,) + tuple(shape[1:]))
  return est <= (budget or pallas_kernel._VMEM_BUDGET) * 2


def get_executor(stencil, shape: Tuple[int, ...], backend: str = 'auto',
                 **kwargs):
  """Build an executor: 'pallas', 'xla', 'sharded', or 'auto'
  (pallas when the working set fits VMEM, else xla)."""
  if backend == 'auto':
    if pallas_fits(stencil, shape):
      backend = 'pallas'
    elif len(shape) == 3:
      # oversized cross-section: mid-dimension tiling over the fused
      # kernel (halo-overlapped, reference host-tiling analog)
      from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
      try:
        return MidTiledPallasExecutor(stencil, shape, **kwargs)
      except Exception:  # noqa: BLE001 - fall through to XLA
        backend = 'xla'
    else:
      backend = 'xla'
  if backend == 'pallas':
    from soda_tpu.backend.pallas_kernel import PallasExecutor
    return PallasExecutor(stencil, shape, **kwargs)
  if backend == 'xla':
    from soda_tpu.backend.xla import XlaExecutor
    return XlaExecutor(stencil, shape, **kwargs)
  if backend == 'sharded':
    from soda_tpu.parallel.spmd import ShardedExecutor
    return ShardedExecutor(stencil, shape, **kwargs)
  raise ValueError('unknown backend: %s' % backend)
