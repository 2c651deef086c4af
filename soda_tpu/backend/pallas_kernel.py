"""Fused Pallas stencil kernel: the flagship TPU compute path.

One ``pl.pallas_call`` executes the ENTIRE multi-stage stencil pipeline
(the reference would instantiate a network of line-buffer/compute
modules connected by FIFOs — ICCAD'18 microarchitecture,
dataflow.py:336-625; here the line buffer is a VMEM slab and every FIFO
is a register/VMEM shift):

  - The grid walks the streaming dimension (array axis 0) in blocks of
    ``block_rows`` rows; 3-D grids may also block the mid axis
    (halo-overlapped sub-slabs joining the grid — MidTiledPallasExecutor).
  - Inputs stay in HBM; a double-buffered async DMA streams halo'd
    slabs into VMEM scratch, prefetching the next grid step's slab
    during compute — the analog of the reference's burst read
    pipelining (hls_kernel.py:238-327). Sublane-axis DMA offsets are
    rounded to the 8-row tile (Mosaic alignment); the streaming axis of
    3-D grids is a free plane stride and takes exact halos.
  - Stage results flow as VALUES (``stage_mode='value'``, the default):
    consumers take static slices of producer values — register shifts,
    no per-stage VMEM slab round trip — with sub-32-bit integers kept
    at their C-promoted width end to end (semantics.wrap_promoted;
    range analysis elides provably-no-op wraps). ``stage_mode='vmem'``
    keeps the round-1 design: liveness-reused named slabs, useful for
    very deep CR chains.
  - Lane-axis shifts either rotate in-register (narrow rows) or slice
    across lanes (wide rows); rotate wrap-around only contaminates the
    globally-invalid border columns.
  - ``iterate > 1`` pipelines arrive pre-unrolled in the tensor DAG, so
    temporal blocking comes for free: the input is read from HBM once
    for ALL sweeps (the reference equivalent is the deepened pipeline of
    core.py:320-354).

Blocked extents are padded to a block multiple on the host when
necessary (outputs are cropped back). Grid-shape contract matches the
other executors: arrays indexed in reversed DSL-dim order, outputs only
defined on the valid region.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from soda_tpu import utils
from soda_tpu.backend import semantics
from soda_tpu.backend.plan import (FusionPlan, make_plan,
                                   validate_grid)
from soda_tpu.ir import nodes as ir

# VMEM budget for choosing block_rows (bytes); leaves headroom out of
# the ~16 MB scoped limit for Mosaic's own temporaries.
_VMEM_BUDGET = 14 * 1024 * 1024
# hard legality floor: the physical scoped-VMEM limit. Configurations
# whose *minimum* working set exceeds this cannot compile; ones between
# the soft budget and this line are attempted (the estimate is
# deliberately conservative).
_VMEM_LIMIT = 16 * 1024 * 1024

# Sublane tile: streaming-dim DMA offsets must be multiples of this.
_ALIGN = 8

# Roll-mode shifted-load CSE (exp46) — measured REFUTED as a default:
# Mosaic already CSEs duplicate rolls (denoise2d re-rolls u at all 4
# diff offsets and the memo is timing-neutral there), while the
# Python-level memo actively HURTS small-block schedules by extending
# live ranges (denoise3d peel+b16: 0.780 -> 0.600 frac). Kept as a
# trace-time diagnostic flag; production traces with it OFF and relies
# on Mosaic's CSE.
_ROLL_CSE = False
# Trace-time tally of shifted-load duplication (diagnostics + the
# regression test that pins the counting): computed = distinct
# (tensor, offset) loads, reused = duplicate loads observed (served
# from the memo only when _ROLL_CSE is on; otherwise re-rolled and
# left for Mosaic's own CSE, which exp46 measured as just as good).
_ROLL_STATS = {'computed': 0, 'reused': 0}


def _axis0_align(dim: int) -> int:
  """Alignment unit for streaming-axis (array axis 0) DMA offsets.

  Mosaic's 8-alignment rules (dynamic offsets and slice shapes) apply
  to the SUBLANE dimension — array axis 0 only for 2-D grids. For 3-D
  grids axis 0 is a plain plane stride, so 1-cell halos need no
  padding to 8 (which would otherwise triple the read amplification of
  small blocks)."""
  return _ALIGN if dim <= 2 else 1


def _pad_to(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def _padded_cells(shape: Tuple[int, ...]) -> int:
  """VMEM footprint cells of an array shape after (8, 128) tiling."""
  if len(shape) == 1:
    return _pad_to(shape[0], 128)
  padded = list(shape)
  padded[-1] = _pad_to(padded[-1], 128)
  padded[-2] = _pad_to(padded[-2], 8)
  return int(np.prod(padded))


def scratch_slots(plan: FusionPlan, skip=()):
  """Liveness-based scratch-slot assignment for stage buffers.

  The register-allocation analog of the reference's FIFO sizing: a
  stage's slab is live from its production to its last consumer, and
  dead slabs are reused by later same-dtype stages. Long CR chains
  (e.g. contrast's 80+ reuse variables) then need a handful of slabs
  instead of one each. Stages in ``skip`` get no slot (chunked mode
  stores childless outputs straight into the output block). Returns
  (slot_of: name -> slot id, slot_dtypes: list of np dtypes).
  """
  stage_names = {s.name for s in plan.stages}
  outputs = set(plan.stencil.output_names)
  last_use: Dict[str, int] = {}
  for idx, stage in enumerate(plan.stages):
    for parent in stage.tensor.ld_refs:
      if parent in stage_names:
        last_use[parent] = idx
  slot_of: Dict[str, int] = {}
  slot_dtypes = []
  free: Dict[object, list] = {}
  for idx, stage in enumerate(plan.stages):
    if stage.name not in skip:
      dt = stage.dtype.np_dtype
      pool = free.setdefault(dt, [])
      if pool:
        slot = pool.pop()
      else:
        slot = len(slot_dtypes)
        slot_dtypes.append(dt)
      slot_of[stage.name] = slot
    # parents whose last consumer is this stage free up for the NEXT
    # stage (never for this one: their reads must complete first);
    # outputs stay live to the final store
    for parent in set(stage.tensor.ld_refs):
      if (parent in slot_of and parent not in outputs and
          last_use.get(parent) == idx):
        p_dt = None
        for st in plan.stages:
          if st.name == parent:
            p_dt = st.dtype.np_dtype
            break
        free.setdefault(p_dt, []).append(slot_of[parent])
  return slot_of, slot_dtypes


def estimate_vmem(plan: FusionPlan, shape: Tuple[int, ...],
                  block_rows: int, stage_mode: str = 'vmem',
                  compute_chunk: Optional[int] = None,
                  prefetch: int = 2) -> int:
  """Working-set estimate of the fused kernel at a given block size:
  ``prefetch``-deep input slabs + per-stage scratch + fold temporaries +
  Pallas's double-buffered output blocks. ``compute_chunk`` bounds the
  fold temporaries at chunk size (chunked stage evaluation)."""
  dim = plan.dim
  a0 = _axis0_align(dim)
  lo = _pad_to(plan.halo_lo[dim - 1], a0)
  hi = plan.halo_hi[dim - 1]
  rest = shape[1:]
  s = _pad_to(block_rows + lo + hi, a0)
  total = 0
  for name in plan.stencil.input_names:
    esize = plan.stencil.symbol_table[name].width_in_bytes
    total += max(2, prefetch) * _padded_cells((s,) + rest) * esize
  # per-SLOT VMEM scratch (liveness-reused slabs): storage width in
  # vmem mode; C-promoted width in value mode (wrap_promoted keeps
  # sub-32-bit integers at i32)
  _, slot_dtypes = scratch_slots(plan)
  for dt in slot_dtypes:
    esize = np.dtype(dt).itemsize
    if stage_mode == 'value' and np.dtype(dt).kind in 'iu':
      esize = max(4, esize)
    total += _padded_cells((s,) + rest) * esize
  # ...plus transient fold temporaries at compute width. In slice mode
  # (wide lanes) Mosaic keeps roughly every shifted tap load of a
  # statement live at once — measured: 19-tap folds allocate ~16-19
  # slab temporaries, with a scheduler window cap near 20. Rotate mode
  # (narrow lanes) and value mode consume loads in place (the slot
  # count above IS the peak stage liveness there).
  if plan.stages:
    if stage_mode == 'value':
      factor = 2
    elif rest and rest[-1] <= 256:  # rotate-mode lane extents
      factor = 3
    else:
      max_loads = max(
          sum(len(refs) for refs in stage.tensor.ld_refs.values())
          for stage in plan.stages)
      factor = max(3, min(max_loads, 20) + 2)
    temp_rows = s if compute_chunk is None else min(s, compute_chunk)
    total += factor * _padded_cells((temp_rows,) + rest) * max(
        max(4, stage.dtype.width_in_bytes) for stage in plan.stages)
  # ...plus Pallas's double-buffered output blocks
  for out_name in plan.stencil.output_names:
    esize = plan.stencil.symbol_table[out_name].width_in_bytes
    total += 2 * _padded_cells((block_rows,) + rest) * esize
  return total


def choose_block_rows(plan: FusionPlan, shape: Tuple[int, ...],
                      budget: int = _VMEM_BUDGET,
                      stage_mode: str = 'vmem',
                      compute_chunk: Optional[int] = None,
                      prefetch: int = 2) -> int:
  """Largest power-of-two block_rows whose slab working set fits the
  VMEM budget — the analog of the reference's FIFO-depth solve
  (dataflow.py:94-176) for the fused-kernel world."""
  best = 8
  for b in (8, 16, 32, 64, 128, 256, 512, 1024):
    if estimate_vmem(plan, shape, b, stage_mode, compute_chunk,
                     prefetch) <= budget:
      best = b
    else:
      break
  return best


def transposed_lane_regions(plan: FusionPlan, stencil,
                            transpose_lanes: str) -> set:
  """Stage names that evaluate in transposed (lane-major) layout:
  maximal producer-consumer chains whose loads shift ONLY along the
  lane axis, admitted by the measured shift-vs-crossing economics
  (see the call site in _build for the measured numbers)."""
  dim = plan.dim
  lane_only = {}
  for stg in plan.stages:
    ok = True
    for parent, offs in stg.load_offsets.items():
      if parent in stencil.param_names:
        continue
      for off in offs:
        if any(off[d] for d in range(1, dim)):
          ok = False
    lane_only[stg.name] = ok
  consumers = {stg.name: set() for stg in plan.stages}
  for stg in plan.stages:
    for parent in stg.tensor.ld_refs:
      if parent in consumers:
        consumers[parent].add(stg.name)
  # connected components over lane-only stages (edges: producer ->
  # consumer where both are lane-only)
  comp: Dict[str, set] = {}
  for stg in plan.stages:
    if not lane_only[stg.name]:
      continue
    comp.setdefault(stg.name, {stg.name})
    for parent in stg.tensor.ld_refs:
      if lane_only.get(parent):
        merged = comp[parent] | comp[stg.name]
        for n in merged:
          comp[n] = merged
  outputs_set = set(stencil.output_names)
  transposed = set()
  for members in {id(c): c for c in comp.values()}.values():
    lane_shifts = 0
    entries = set()
    exits = 0
    for stg in plan.stages:
      if stg.name not in members:
        continue
      for parent, offs in stg.load_offsets.items():
        if parent in stencil.param_names:
          continue
        if parent not in members:
          entries.add(parent)
        lane_shifts += len({off[0] for off in offs if off[0]})
      if (stg.name in outputs_set or
          any(c not in members for c in consumers[stg.name])):
        exits += 1
    # measured economics (v5e): a transpose costs ~7 slots/cell —
    # far more than first estimated — so 'auto' additionally caps
    # the region boundary at two crossings. Measured: erosion
    # (1 entry + 1 exit) wins +0.02-0.03 roofline, sobel2d
    # (2 entries + 1 exit) LOSES 0.05, xcorr (3 crossings) is
    # neutral-to-worse. 'on' applies only the shift-count test.
    crossings = len(entries) + exits
    if 3 * lane_shifts <= 2.5 * crossings + 4:
      continue
    if transpose_lanes == 'on' or crossings <= 2:
      transposed |= members
  return transposed


class PallasExecutor:
  """Compile a stencil into one fused Pallas TPU kernel.

  Args:
    stencil: a core.Stencil.
    shape: full array shape (array-axis order, streaming axis first).
    block_rows: streaming-dim block size (default: VMEM-budget driven).
    interpret: force interpreter mode (default: auto — interpret
      everywhere except on real TPU backends).
  """

  def __init__(self, stencil, shape: Tuple[int, ...],
               block_rows: Optional[int] = None,
               interpret: Optional[bool] = None,
               lane_shift: str = 'auto',
               stage_mode: str = 'auto',
               mid_tile: Optional[int] = None,
               compute_chunk: Optional[int] = None,
               apply_preserve_border: bool = True,
               transpose_lanes: str = 'auto',
               narrow: str = 'auto',
               out_dma: bool = False,
               stream_loop: bool = False,
               shift_mode: str = 'window',
               prefetch: int = 2,
               dma_split: int = 1):
    import jax
    self.stencil = stencil
    self.shape = tuple(shape)
    validate_grid(stencil, self.shape)
    # the sharded executor redoes the preserve fix-up with the GLOBAL
    # boundary after cropping, so its inner kernel skips the per-shard
    # pass that would be discarded
    self.apply_preserve_border = apply_preserve_border
    if transpose_lanes not in ('auto', 'on', 'off'):
      raise ValueError("transpose_lanes must be auto|on|off")
    self.transpose_lanes = transpose_lanes
    if narrow not in ('auto', 'on', 'off'):
      raise ValueError("narrow must be auto|on|off")
    # narrow: evaluate eligible integer stages at NATIVE 16-bit width
    # (exactness + Mosaic legality gated by
    # optimization.ranges.narrow16_stages). 'auto' currently resolves
    # to OFF: measured on v5e (exp14), current Mosaic keeps i16
    # vectors at one value per 32-bit lane, so the 2x density never
    # materializes and the conversion churn loses ~10% (xcorr 0.25 vs
    # 0.29). 'on' forces it for A/B measurement; flip 'auto' when a
    # Mosaic update packs 16-bit vregs. RE-PROBE CADENCE: once per
    # round run `experiments/exp12_mosaic_reprobe.py native swar`
    # (i16 min/max/mul legality — a fixed native i16 min alone is ~2x
    # on erosion) and exp13/exp14 (vreg packing: narrow wins only
    # when i16 packs 2/lane). Last re-probe 2026-08-21 (third fleet
    # day in a row): i16 min/max crash, i16 mul SIGABRTs, u16 min and
    # SWAR i16x2 min crash; i16 add and the SWAR guarded-add pass.
    self.narrow = narrow
    # out_dma: bypass the Pallas output-block pipeline — outputs stay
    # HBM refs and each grid step DMAs its finished block out of a
    # double-buffered VMEM staging slab (candidate for the ~2us
    # per-grid-step fixed cost, VERDICT r2 item 2). Stores cover FULL
    # blocks (globally-invalid border cells receive stale staging
    # data, which only ever lands outside the valid region).
    self.out_dma = bool(out_dma)
    # stream_loop: run ALL grid steps inside ONE kernel invocation
    # (empty Pallas grid, lax.fori_loop over steps, implies out_dma
    # staging for outputs). Candidate for the ~2us fixed cost per
    # Pallas grid step that caps 256^3 jacobi3d at 0.45 of roofline
    # (exp27 isolates grid-entry overhead vs an in-kernel loop on the
    # same slab DMA pattern). 'peel' additionally peels the boundary
    # steps out of the loop so the steady-state interior body carries
    # NO stream-class branches (they are pruned at trace time).
    if stream_loop not in (False, True, 'peel'):
      raise ValueError("stream_loop must be False|True|'peel'")
    self.stream_loop = stream_loop
    # prefetch: input-slab buffering depth. 2 = classic double buffer
    # (fill for step i+1 started at step i). Depths 3-4 start fills
    # prefetch-1 steps ahead — a lever against DMA grant latency when
    # steps are short (the ~2us/step wall, exp30). Depth > 2 disables
    # the rolling slab fill (its slab-to-slab overlap copy serializes
    # completions one step apart, so deeper fills would overwrite the
    # overlap source early) and costs prefetch input slabs of VMEM.
    if not 2 <= int(prefetch) <= 4:
      raise ValueError('prefetch must be in [2, 4]')
    self.prefetch = int(prefetch)
    # dma_split: issue each input-slab fill as this many back-to-back
    # sub-DMAs over row sub-ranges (same semaphore slot, one wait per
    # descriptor) so later grants overlap the first transfer's
    # streaming — exp30 measured +7% on the pure-DMA replay of the
    # 256^3 slab pattern (blk4 split4 0.870 -> 0.934). 3-D only: the
    # streaming axis there is a free plane stride, so sub-range
    # offsets carry no sublane-alignment constraint (2-D row offsets
    # must stay 8-aligned, which even sub-splits would violate).
    if not 1 <= int(dma_split) <= 8:
      raise ValueError('dma_split must be in [1, 8]')
    if int(dma_split) > 1 and len(self.shape) < 3:
      raise ValueError('dma_split requires a 3-D (or higher) grid')
    self.dma_split = int(dma_split)
    if shift_mode not in ('window', 'roll'):
      raise ValueError("shift_mode must be window|roll")
    # shift_mode='roll' (value mode only): every shifted load is an
    # in-register ROTATE of a full-slab-extent value (pltpu.roll on
    # the stream/mid axes — legal since the round-3 Mosaic update,
    # exp12 — and the lane rotate for the minor axis) instead of a
    # misaligned windowed slice. Wrap-around garbage lands exactly in
    # the slab-margin cells the validity analysis already excludes;
    # store windows clip to those margins, so valid cells never see
    # it. Motivated by exp16: isolated rotate-style chains run near 1
    # cycle/vreg-op while windowed slab slices measure 2.6-4.5 slots.
    self.shift_mode = shift_mode
    semantics.require_f64_support(stencil)
    if lane_shift == 'auto':
      # measured on v5e: for narrow lane extents (~one or two vregs)
      # the in-register rotate wins by up to 2.2x; for wide rows the
      # winner is workload-specific (erosion/xcorr prefer rotate,
      # sobel/f32 kernels prefer the lane-crossing shifted load) —
      # the conservative default is slice, and hardware probing
      # (tools/autotune.py, the bench's measured probe) picks per
      # kernel
      lane_shift = 'rotate' if shape[-1] <= 256 else 'slice'
    self.lane_shift = lane_shift
    self.plan = make_plan(stencil, 'full')
    if stage_mode == 'auto':
      # value mode keeps stage results flowing through registers /
      # Mosaic-managed temporaries (no VMEM slab round-trip per stage)
      # and is the fast path. Exception, measured on v5e Mosaic
      # (experiments/exp6_crashes.py): very long arithmetic chains
      # over shifted VALUE slices (xcorr's un-CR'd 19-tap sums,
      # contrast's 289-tap table) crash the compiler, while the same
      # folds over VMEM-slab loads compile — so wide-fold stages take
      # the named-slab path. (Computation reuse shrinks folds to 2-3
      # operands, so optimized pipelines stay on the value path.)
      stage_mode = 'value'
      wide_stages = 0
      for stage in self.plan.stages:
        widest = [0]

        def chain_width(node, _):
          if isinstance(node, ir.CHAIN_CLASSES):
            widest[0] = max(widest[0], len(node.operand))
          return node

        stage.tensor.expr.visit(chain_width)
        for let in stage.tensor.lets:
          let.expr.visit(chain_width)
        if widest[0] > 12:
          stage_mode = 'vmem'
          break
        if widest[0] > 8:
          wide_stages += 1
      # empirical second boundary: MANY near-limit fold stages (plain
      # contrast: 26 stages of 12 dense 2-D taps each) also crash,
      # while a handful (xcorr's split sums, CR'd contrast's split top
      # reduction) compile
      if wide_stages > 4:
        stage_mode = 'vmem'
    if stage_mode not in ('value', 'vmem'):
      raise ValueError('stage_mode must be value|vmem|auto')
    # chunked stage evaluation: compute each stage's valid region in
    # axis-0 sub-chunks written into its VMEM slab, so Mosaic's fold
    # temporaries are chunk-sized instead of slab-sized. This is what
    # makes LARGE blocks compile on wide 3-D cross-sections (the 256^3
    # case): per-grid-step fixed costs amortize over 2-4x more rows at
    # the same scoped-VMEM footprint. 3-D only: axis 0 there is a free
    # plane stride, so chunk slices need no tile alignment.
    if compute_chunk is not None:
      if len(shape) < 3:
        raise utils.InputError('compute_chunk applies to 3-D grids only')
      if not isinstance(compute_chunk, int) or compute_chunk < 1:
        raise utils.InputError('compute_chunk must be a positive int, '
                               'got %r' % (compute_chunk,))
      stage_mode = 'vmem'
    self.compute_chunk = compute_chunk
    self.stage_mode = stage_mode
    if len(self.shape) != self.plan.dim:
      raise utils.InputError('expected %d-D arrays, got %d-D' %
                             (self.plan.dim, len(self.shape)))
    if self.plan.dim < 2:
      raise utils.InputError(
          'the Pallas backend needs >= 2-D grids (TPU vector registers '
          'are 2-D); use the XLA backend for 1-D stencils')
    if interpret is None:
      interpret = jax.default_backend() != 'tpu'
    self.interpret = interpret
    if not interpret and semantics.has_half(stencil):
      # Mosaic has no f16 type at all ("Unsupported type in mosaic
      # dialect: 'f16'", probed); XLA:TPU handles half, so get_executor
      # dispatches it there
      raise utils.InputError(
          'half-typed stencils are not supported by the TPU kernel '
          'compiler (Mosaic has no f16); use the XLA backend '
          '(get_executor("auto") dispatches this)')

    dim = self.plan.dim
    # halo below is rounded to the sublane tile so interior slab starts
    # (i*b - lo) stay tile-aligned for the DMA engine
    self.align0 = _axis0_align(dim)
    self.lo = _pad_to(self.plan.halo_lo[dim - 1], self.align0)
    self.hi = self.plan.halo_hi[dim - 1]
    h = self.shape[0]
    # Mosaic DMA slices require tile-aligned shapes: lane dim to 128,
    # sublane dim to 8. Non-aligned grids are padded on device and
    # cropped back (the padding lives in the invalid border region).
    rest = list(self.shape[1:])
    rest[-1] = _pad_to(rest[-1], 128)
    if len(rest) >= 2:
      rest[-2] = _pad_to(rest[-2], _ALIGN)
    self.rest_pad = tuple(rest)

    # optional mid-axis (array axis 1) blocking for 3-D grids whose
    # cross-section exceeds the VMEM budget: the mid axis joins the
    # Pallas grid with halo-overlapped sub-slabs, so tiles pipeline
    # through the same double-buffered DMA as streaming blocks (the
    # in-grid analog of the reference host's halo-overlapped spatial
    # tiling, host.py:641-701)
    self.mid_tile = None
    self.grid_m = 1
    if mid_tile is not None:
      if dim != 3:
        raise utils.InputError('mid tiling applies to 3-D grids only')
      if self.stage_mode != 'value' and compute_chunk is None:
        raise utils.InputError('mid tiling requires stage_mode=value')
      m = self.shape[1]
      mlo = _pad_to(self.plan.halo_lo[1], _ALIGN)
      mhi = self.plan.halo_hi[1]
      mt = _pad_to(max(mid_tile, mlo, mhi + 1), _ALIGN)
      m_pad = _pad_to(m, mt)
      ext = _pad_to(mt + mlo + mhi, _ALIGN)
      if ext >= m_pad or mt >= m_pad:
        mt = m_pad = _pad_to(m, _ALIGN)
        ext = m_pad
        self.grid_m = 1
      else:
        self.grid_m = m_pad // mt
      self.mid_tile, self.mid_ext = mt, ext
      self.mid_lo, self.mid_hi = mlo, mhi
      self.m_pad = m_pad
      self.rest_pad = (m_pad, self.rest_pad[-1])

    est_shape = self.shape if self.mid_tile is None else (
        self.shape[0], self.mid_ext, self.shape[2])
    b = block_rows or choose_block_rows(self.plan, est_shape,
                                        stage_mode=self.stage_mode,
                                        compute_chunk=self.compute_chunk,
                                        prefetch=self.prefetch)
    if (block_rows is None and self.shift_mode == 'roll' and
        len(self.shape) == 2 and self.transpose_lanes != 'off' and
        transposed_lane_regions(self.plan, self.stencil,
                                self.transpose_lanes)):
      # hybrid transposed regions crash Mosaic above 256 stream rows
      # (oversized transposed full-extent temporaries, exp22); clamp
      # the estimator's pick — an explicit block_rows overrides.
      # Kernels where no region actually forms (e.g. blur, whose
      # measured-best roll block is 512 rows) keep the full pick.
      b = min(b, 256)
    # b >= lo keeps interior DMA starts in bounds; b > hi keeps them
    # from clipping at the top
    b = _pad_to(max(b, self.lo, self.hi + 1), self.align0)
    # padding the streaming extent to a block multiple makes every
    # block's slab offset static (first / interior / tail)
    self.h_pad = _pad_to(h, b)
    slab = _pad_to(b + self.lo + self.hi, self.align0)
    if slab >= self.h_pad or b >= self.h_pad:
      # tiny grid: single block covering everything
      b = self.h_pad = _pad_to(h, self.align0)
      self.slab = self.h_pad
      self.grid = 1
    else:
      self.slab = slab
      self.grid = self.h_pad // b
    self.block_rows = b
    if block_rows is None:
      # legality gate (the II=1-feasibility analog, reference
      # dataflow.py:43-92): if even the MINIMUM feasible block's
      # working set exceeds the physical scoped-VMEM limit, fail
      # loudly instead of letting Mosaic OOM with an inscrutable
      # error. The minimum is the halo-clamped block, not 8: deep
      # pipelines force b >= halo. Callers that pass an explicit
      # block_rows override the estimate entirely (it is deliberately
      # conservative; the bench's compile-probe relies on this).
      min_b = _pad_to(max(8, self.lo, self.hi + 1), self.align0)
      if estimate_vmem(self.plan, est_shape, min_b, self.stage_mode,
                       self.compute_chunk, self.prefetch) > _VMEM_LIMIT:
        raise utils.InputError(
            'estimated VMEM working set exceeds the %d MB scoped limit '
            'even at the minimum block size (%d); shrink the '
            'cross-section (mid tiling / sharding), use cluster: '
            'coarse, or use the XLA backend (get_executor("auto") '
            'dispatches this)' % (_VMEM_LIMIT // 2**20, min_b))
    self._fn = jax.jit(self._build())

  # -- kernel construction ----------------------------------------------------
  def _build(self):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stencil = self.stencil
    plan = self.plan
    dim = plan.dim
    pad_rest = self.rest_pad
    h = self.h_pad
    pad_shape = (h,) + pad_rest
    b, s, lo = self.block_rows, self.slab, self.lo
    mid_blocked = self.mid_tile is not None
    if mid_blocked:
      mt, ext_m, lo_m, m_pad = (self.mid_tile, self.mid_ext,
                                self.mid_lo, self.m_pad)
      rest = (ext_m,) + pad_rest[1:]  # slab cross-section
      out_block = (b, mt, pad_rest[-1])
    else:
      mt = ext_m = lo_m = m_pad = None
      rest = pad_rest
      out_block = (b,) + pad_rest
    n_in = len(stencil.input_names)
    n_par = len(stencil.param_names)
    n_out = len(stencil.output_names)
    input_types = {
        name: stencil.symbol_table[name] for name in stencil.input_names
    }
    single = self.grid * self.grid_m == 1
    stream_loop = bool(self.stream_loop) and not single
    stream_peel = self.stream_loop == 'peel'
    out_dma = (self.out_dma or stream_loop) and not single
    interpret = self.interpret
    # input-slab buffering depth: fills start depth-1 steps ahead.
    # Clamped so the look-ahead crosses at most one mid-tile boundary.
    depth = 1 if single else self.prefetch
    if not single:
      # never more slabs than there are steps to fill them with
      depth = min(depth, self.grid * self.grid_m)
      if self.grid_m > 1:
        depth = min(depth, max(2, self.grid))

    n_blocks = self.grid

    def axis_classes(nb: int, blk: int, lo_: int, size_: int, ext_: int):
      """Static slab base per block class of one blocked axis: the
      host-side padding of the extent to a block multiple makes these
      compile-time constants, so output stores are static slices."""

      def start(step: int) -> int:
        return min(max(step * blk - lo_, 0), size_ - ext_)

      if nb == 1:
        classes = [('all', 0 - start(0))]
      else:
        classes = [('first', 0 - start(0))]
        if nb > 2:
          classes.append(('mid', blk - start(1)))
        classes.append(('tail', (nb - 1) * blk - start(nb - 1)))
        if len({base for _, base in classes}) == 1:
          classes = [('all', classes[0][1])]
      # construction invariants (the deadlock-freedom analog of the
      # reference's verify_mode_depths, dataflow.py:43-92): every block
      # class that can occur writes from a fully in-slab window
      for _, base in classes:
        assert 0 <= base and base + blk <= ext_, (base, blk, ext_, lo_)
      return classes

    stream_classes = axis_classes(self.grid, b, lo, h, s)
    mid_classes = (axis_classes(self.grid_m, mt, lo_m, m_pad, ext_m)
                   if mid_blocked else [(None, None)])
    # legacy stream-class bases for the vmem-mode store path
    base_of = dict(stream_classes)
    base_first = base_of.get('first', base_of.get('all', 0))
    base_mid = base_of.get('mid', base_of.get('all', base_first))
    base_tail = base_of.get('tail', base_of.get('all', base_first))

    # Valid slab-coordinate margins per tensor, per array axis: a stage
    # cell is computable where every load hits a written / in-slab cell
    # of its parent. All static. With lane_shift='rotate', the minor
    # (lane) axis is exempt: lane shifts rotate the loaded value
    # instead of slicing across lanes, and rotate wrap-around only
    # contaminates the globally-invalid border columns.
    value_mode_early = self.stage_mode == 'value'
    roll_mode = value_mode_early and self.shift_mode == 'roll'
    if self.shift_mode == 'roll' and not value_mode_early:
      raise utils.InputError('shift_mode=roll requires stage_mode=value')
    # roll mode rotates lanes too, so lane margins are exempt the same
    # way rotate mode's are (wrap garbage only ever contaminates the
    # globally-invalid border columns)
    rotate_lanes = self.lane_shift == 'rotate' or roll_mode
    n_margin_axes = dim - 1 if rotate_lanes else dim
    size = (s,) + rest
    slab_margins: Dict[str, Tuple[Tuple[int, int], ...]] = {
        name: ((0, 0),) * dim for name in stencil.input_names
    }
    for stage in plan.stages:
      st_idx = stage.tensor.st_idx
      margins = [[0, 0] for _ in range(dim)]
      for parent_name, refs_ in stage.tensor.ld_refs.items():
        if parent_name in stencil.param_names:
          continue
        p_m = slab_margins[parent_name]
        for ref in refs_:
          for a in range(n_margin_axes):
            d = dim - 1 - a
            delta = ref.idx[d] - st_idx[d]
            margins[a][0] = max(margins[a][0], p_m[a][0] - delta)
            margins[a][1] = max(margins[a][1], p_m[a][1] + delta)
      slab_margins[stage.name] = tuple(
          (m[0], m[1]) for m in margins)

    def _region(name) -> Tuple[slice, ...]:
      return tuple(
          slice(m[0], size[a] - m[1])
          for a, m in enumerate(slab_margins[name]))

    stage_names = [stage.name for stage in plan.stages]
    # per-stage wrap-elision proofs (set by ranges.annotate in make_plan)
    wrap_free = getattr(stencil, '_wrap_free', {})
    value_mode = self.stage_mode == 'value'
    chunk = self.compute_chunk

    # Transposed lane regions (2-D value mode, slice lane mode):
    # maximal chains of stages whose loads shift ONLY along the lane
    # axis evaluate in transposed layout — lane shifts become sublane
    # slices (measured 2.3x cheaper than lane-crossing shifts/rolls
    # for a 19-tap doubling chain: 16 vs 37 slots/cell) at the price
    # of one transpose per region entry/exit. This is the second-pass
    # half of 1-D-separated kernels (erosion/xcorr's 19-tap passes,
    # sobel's factored gradients).
    # Under roll mode the same region machinery composes as a HYBRID:
    # member stages evaluate transposed at full slab extent, each
    # lane-logical shift an axis-0 roll of the transposed value and
    # each sublane shift a lane roll — pairing roll mode's cheap
    # sublane shifts with the transposed chain evaluation that slice
    # mode measured 2.3x cheaper than lane-crossing rolls.
    transposed = set()
    if (value_mode and dim == 2 and (roll_mode or not rotate_lanes) and
        self.transpose_lanes != 'off'):
      transposed = transposed_lane_regions(plan, stencil,
                                           self.transpose_lanes)
    # Narrow 16-bit stage evaluation (value mode): stages the
    # wrap-sinking/legality analysis admits run at native i16/u16 —
    # every slab temporary, shifted load, and ALU op covers 2x the
    # elements per vreg. Transposed-region stages are exempt (the
    # region machinery is measured/tuned at 32-bit).
    narrow16: set = set()
    if value_mode and self.narrow == 'on':
      from soda_tpu.optimization import ranges as ranges_mod
      narrow16 = ranges_mod.narrow16_stages(stencil) - transposed
    # chunked mode stores childless outputs straight into the output
    # block, so they need no slab slot
    direct_outs = set()
    if chunk is not None:
      direct_outs = {
          name for name in stencil.output_names
          if not stencil.tensors[name].children
      }
    if value_mode:
      slot_of, slot_dtypes = {}, []
    else:
      slot_of, slot_dtypes = scratch_slots(plan, skip=direct_outs)
    lanes = rest[-1]

    def lane_roll(value, delta):
      """value[..., i] = src[..., i + delta] via the VPU lane rotate
      (non-negative shift; Mosaic's rotate needs 32-bit lanes)."""
      if interpret:
        return jnp.roll(value, -delta, axis=-1)
      # modulus is the VALUE's own minor extent: transposed-layout
      # values carry the slab's stream extent in the lane axis
      shift = (-delta) % value.shape[-1]
      dt = value.dtype
      if dt.itemsize < 4:
        wide = jnp.float32 if dt.kind == 'f' else (
            jnp.uint32 if dt.kind == 'u' else jnp.int32)
        return pltpu.roll(value.astype(wide), shift,
                          axis=dim - 1).astype(dt)
      return pltpu.roll(value, shift, axis=dim - 1)

    def axis_roll(value, delta, axis):
      """value[.., i, ..] = src[.., i + delta, ..] on a non-lane axis
      (stream/mid): in-register rotate instead of a windowed slice;
      wrap garbage lands in the slab-margin cells stores clip away."""
      if interpret:
        return jnp.roll(value, -delta, axis=axis)
      dt = value.dtype
      if dt.itemsize < 4:
        # same Mosaic i16 legality gap as lane_roll: roll on narrow
        # vectors is not in the legalized set (exp12 catalog)
        wide = jnp.float32 if dt.kind == 'f' else (
            jnp.uint32 if dt.kind == 'u' else jnp.int32)
        return pltpu.roll(value.astype(wide),
                          (-delta) % value.shape[axis],
                          axis=axis).astype(dt)
      return pltpu.roll(value, (-delta) % value.shape[axis], axis=axis)

    def kernel(*refs):
      in_refs = refs[:n_in]
      par_refs = refs[n_in:n_in + n_par]
      out_refs = refs[n_in + n_par:n_in + n_par + n_out]
      scratch = refs[n_in + n_par + n_out:]
      slabs = scratch[:n_in]
      in_sems = scratch[n_in:2 * n_in]
      n_slots = len(slot_dtypes)
      slot_refs = scratch[2 * n_in:2 * n_in + n_slots]
      if out_dma:
        out_stage = scratch[2 * n_in + n_slots:
                            2 * n_in + n_slots + n_out]
        out_sems = scratch[2 * n_in + n_slots + n_out:]
      stage_refs = {
          name: slot_refs[slot_of[name]]
          for name in stage_names if name in slot_of
      }

      n = n_blocks
      total = self.grid_m * n

      def _step(jm, i, steady=False):
        step = jm * n + i

        def when(cond):
          """pl.when that prunes statically-known branches: steady
          interior steps (stream_loop='peel', i in [2, n-3]) resolve
          every stream-class predicate at trace time (step > 0,
          step + 1 < total, rolling/store class 'mid', drain never
          fires), and peeled boundary steps carry static i so their
          class predicates fold to Python bools too."""
          if isinstance(cond, bool):
            return (lambda f: f()) if cond else (lambda f: None)
          return pl.when(cond)

        def axis_start(p, blk, lo_, size_, ext_, align):
          if isinstance(p, int):
            # peeled boundary step (static block index): fold to a
            # Python constant so the DMA offset is static — Mosaic
            # accepts any static offset, and the scalar core does no
            # per-step address arithmetic
            start = min(max(p * blk - lo_, 0), size_ - ext_)
            return (start // align) * align if align > 1 else start
          start = jnp.clip(p * blk - lo_, 0, size_ - ext_)
          if align > 1:
            # sublane-axis DMA offsets must be provably tile-aligned;
            # all quantities are multiples of align, the //* proves it
            start = (start // align) * align
          return start

        def row_chunks(rows):
          # static (offset, extent) sub-ranges for dma_split: each fill
          # issued as several back-to-back DMAs on the SAME semaphore
          # slot (one wait per descriptor), so later grants overlap the
          # first transfer's streaming (exp30: +7% on the pure-DMA
          # replay of the 256^3 slab pattern). 3-D only (constructor):
          # stream-axis offsets are plane strides, no sublane alignment.
          nsub = max(1, min(self.dma_split, rows))
          base, rem = divmod(rows, nsub)
          chunks, off = [], 0
          for p in range(nsub):
            sz = base + (1 if p < rem else 0)
            chunks.append((off, sz))
            off += sz
          return chunks

        def in_copy(k, step_i, step_j, slot):
          ss = axis_start(step_i, b, lo, h, s, self.align0)
          sm = (axis_start(step_j, mt, lo_m, m_pad, ext_m, _ALIGN)
                if mid_blocked else None)
          copies = []
          for off, sz in row_chunks(s):
            src = in_refs[k]
            if mid_blocked:
              src = src.at[pl.ds(ss + off, sz), pl.ds(sm, ext_m)]
            else:
              src = src.at[pl.ds(ss + off, sz)]
            copies.append(pltpu.make_async_copy(
                src, slabs[k].at[slot, pl.ds(off, sz)],
                in_sems[k].at[slot]))
          return copies

        # rolling slab fill: for 3-D grids (streaming axis is a free
        # plane stride) consecutive stream windows within a mid tile
        # overlap by the halo, so interior steps DMA only the NEW b rows
        # from HBM and copy the tiny overlap VMEM->VMEM from the other
        # slot — removing the (b+halo)/b read amplification that caps
        # small-block 3-D kernels (the 256^3 case). Three static classes
        # (the first window's clamped start skews the overlaps):
        #   i==1:        overlap 2*lo+hi, DMA b-lo rows at HBM row s
        #   1<i<n-1:     overlap lo+hi,   DMA b rows    at row i*b+hi
        #   i==n-1:      overlap lo+2*hi, DMA b-hi rows at row (n-1)*b+hi
        r_hi = self.hi
        # rolling requires depth 2: the slab-to-slab overlap copy at
        # step i reads slab (i-1)%2, which a deeper fill would
        # overwrite before the copy
        rolling = (not single and depth == 2 and self.align0 == 1 and
                   self.grid >= 3 and
                   0 < self.plan.halo_lo[dim - 1] + r_hi < b)
        r_lo = self.plan.halo_lo[dim - 1] if rolling else 0  # unpadded
        roll_classes = (
            # (cond_on_target_i, overlap_rows, hbm_row_fn, dma_rows)
            ('second', 2 * r_lo + r_hi, lambda ii: s, b - r_lo),
            ('mid', r_lo + r_hi, lambda ii: ii * b + r_hi, b),
            ('tail', r_lo + 2 * r_hi, lambda ii: ii * b + r_hi, b - r_hi),
        )

        def roll_cond(kind, ii):
          if steady:
            # ii is i or i+1, both within [2, n-2]: always 'mid'
            return kind == 'mid'
          if isinstance(ii, int):  # peeled boundary step: fold now
            if kind == 'second':
              return ii == 1
            if kind == 'mid':
              return 1 < ii < n - 1
            return ii == n - 1  # tail
          if kind == 'second':
            return ii == 1
          if kind == 'mid':
            return jnp.logical_and(ii > 1, ii < n - 1)
          return ii == n - 1  # tail

        def partial_copy(k, kind, ov, row_fn, rows, ii, slot_):
          sm = (axis_start(jm, mt, lo_m, m_pad, ext_m, _ALIGN)
                if mid_blocked else None)
          copies = []
          for off, sz in row_chunks(rows):
            src = in_refs[k]
            if mid_blocked:
              src = src.at[pl.ds(row_fn(ii) + off, sz), pl.ds(sm, ext_m)]
            else:
              src = src.at[pl.ds(row_fn(ii) + off, sz)]
            copies.append(pltpu.make_async_copy(
                src, slabs[k].at[slot_, pl.ds(ov + off, sz)],
                in_sems[k].at[slot_]))
          return copies

        if single:
          # full copies: no ref slicing, so no alignment concerns
          for k in range(n_in):
            pltpu.make_async_copy(in_refs[k], slabs[k].at[0],
                                  in_sems[k].at[0]).start()
          for k in range(n_in):
            pltpu.make_async_copy(in_refs[k], slabs[k].at[0],
                                  in_sems[k].at[0]).wait()
          slot = 0
        else:
          # look-ahead order: streaming blocks first within a mid tile,
          # then the next mid tile (row-major over the grid); fills
          # start depth-1 steps ahead (the clamp above bounds the
          # look-ahead to one tile-boundary crossing)
          la = depth - 1
          if mid_blocked:
            if isinstance(i, int):  # peeled step: fold the wrap now
              nxt_i = i + la if i + la < n else i + la - n
              nxt_j = jm if i + la < n else jm + 1
            else:
              nxt_i = jnp.where(i + la < n, i + la, i + la - n)
              nxt_j = jnp.where(i + la < n, jm, jm + 1)
          else:
            nxt_i, nxt_j = i + la, 0
          slot = step % depth
          nxt_slot = (step + la) % depth

          @when(False if steady else step == 0)
          def _():
            # pipeline warm-up: fills for global steps 0..depth-2
            # (static indices — step 0 is (jm=0, i=0))
            for g in range(min(la, total)):
              gj, gi = divmod(g, n)
              for k in range(n_in):
                for c in in_copy(k, gi, gj, g % depth):
                  c.start()

          if rolling:
            # ORDER MATTERS: wait own fill and copy the overlap out of
            # the previous slab BEFORE starting the next fill — the next
            # fill overwrites exactly that slab's rows.
            @when(False if steady else i == 0)
            def _():
              for k in range(n_in):
                for c in in_copy(k, i, jm, slot):
                  c.wait()
            for kind, ov, row_fn, rows in roll_classes:
              @when(roll_cond(kind, i))
              def _(kind=kind, ov=ov, row_fn=row_fn, rows=rows):
                for k in range(n_in):
                  for c in partial_copy(k, kind, ov, row_fn, rows, i,
                                        slot):
                    c.wait()
                # overlap rows come from the tail of the previous slab
                # (final: its fill was awaited last step; nothing writes
                # a slab between its wait and this copy)
                for k in range(n_in):
                  slabs[k][slot, 0:ov] = slabs[k][1 - slot, s - ov:s]

            for kind, ov, row_fn, rows in roll_classes:
              nxt_cond = roll_cond(kind, i + 1)
              if steady:
                start_cond = nxt_cond
              elif nxt_cond is False:
                # statically impossible (peeled step): do NOT trace the
                # body — its static slice indices may be out of bounds
                start_cond = False
              elif nxt_cond is True:
                start_cond = step + 1 < total
              else:
                start_cond = jnp.logical_and(step + 1 < total, nxt_cond)

              @when(start_cond)
              def _(kind=kind, ov=ov, row_fn=row_fn, rows=rows):
                for k in range(n_in):
                  for c in partial_copy(k, kind, ov, row_fn, rows, i + 1,
                                        nxt_slot):
                    c.start()

            if steady:
              tile_edge = False
            elif isinstance(step, int):  # fully-peeled (static jm too)
              tile_edge = step + 1 < total and i + 1 == n
            else:
              tile_edge = jnp.logical_and(step + 1 < total, i + 1 == n)

            @when(tile_edge)
            def _():
              for k in range(n_in):
                for c in in_copy(k, 0, jm + 1, nxt_slot):
                  c.start()
          else:
            # steady interior with depth <= 3 never runs off the grid:
            # i <= n-3 puts step+la at most at total-1. depth 4 needs
            # the dynamic bound even in the steady body.
            @when(True if steady and depth <= 3 else step + la < total)
            def _():
              for k in range(n_in):
                for c in in_copy(k, nxt_i, nxt_j, nxt_slot):
                  c.start()

            for k in range(n_in):
              for c in in_copy(k, i, jm, slot):
                c.wait()

        # manual output DMA: each step stores into a double-buffered VMEM
        # staging slab and copies it to the HBM output ref itself,
        # bypassing Pallas's output-block pipeline. The slot's previous
        # copy is awaited two steps later (before overwriting); the last
        # step drains everything.
        slot_out = step % 2 if out_dma else 0

        def out_copy(k, slot_, ii, jj):
          def aligned(p, blk, align):
            # same Mosaic rule as axis_start: traced sublane DMA
            # offsets must be PROVABLY tile-aligned; blk is a multiple
            # of align, the //* makes that visible to the prover
            off = p * blk
            if align > 1 and not isinstance(p, int):
              off = (off // align) * align
            return off

          dst = out_refs[k]
          if mid_blocked:
            dst = dst.at[pl.ds(aligned(ii, b, self.align0), b),
                         pl.ds(aligned(jj, mt, _ALIGN), mt)]
          else:
            dst = dst.at[pl.ds(aligned(ii, b, self.align0), b)]
          return pltpu.make_async_copy(out_stage[k].at[slot_], dst,
                                       out_sems[k].at[slot_])

        if out_dma:
          @when(True if steady else step >= 2)
          def _():
            for k in range(n_out):
              out_copy(k, slot_out, i, jm).wait()

        def parent_ref(name):
          if name in stage_refs:
            return stage_refs[name], ()
          k = stencil.input_names.index(name)
          return slabs[k], (slot if not single else 0,)

        params = {
            name: par_refs[k] for k, name in enumerate(stencil.param_names)
        }

        # value mode: stage results are jnp values shaped to their valid
        # region; consumers take static slices of parent values (Mosaic
        # lowers these to register shifts) instead of re-reading a VMEM
        # slab. Input slabs are read once and shared across all taps.
        # Sub-32-bit integer values are kept at their C-promoted width
        # (i32) throughout — one widen per input, one narrow per output,
        # zero relayouts at stage boundaries (semantics.wrap_promoted).
        # Stages in a transposed lane region live in stage_vals_T with
        # their two axes swapped; layout conversions happen lazily and
        # are cached.
        stage_vals: Dict[str, object] = {}
        stage_vals_T: Dict[str, object] = {}
        input_vals: Dict[str, object] = {}
        input_vals_nw: Dict[str, object] = {}
        # Roll-mode shifted-load memo: (tensor, per-axis delta) -> the
        # rolled full-extent value, shared ACROSS consumer stages within
        # one step (keys are delta-based, so stages with different
        # st_idx share correctly). exp46 measured the memo REFUTED as a
        # default — Mosaic already CSEs duplicate rolls (neutral on
        # denoise2d/xcorr where duplicates exist) and the memo's longer
        # live ranges cost -23% on denoise3d peel+b16 — so _ROLL_CSE
        # stays off and the dict serves as the duplication tally.
        roll_cache: Dict[tuple, object] = {}
        roll_cache_T: Dict[tuple, object] = {}

        def parent_val(name):
          if name in stage_vals:
            return stage_vals[name], slab_margins[name]
          if name in stage_vals_T:
            stage_vals[name] = stage_vals_T[name].T
            return stage_vals[name], slab_margins[name]
          if name not in input_vals:
            k = stencil.input_names.index(name)
            v = slabs[k][slot if not single else 0]
            t = input_types[name]
            if not t.is_float and t.width_in_bits < 32:
              v = v.astype(semantics.promote(t).np_dtype)
            input_vals[name] = v
          return input_vals[name], slab_margins[name]

        def parent_val_nw(name):
          """Parent value for a NARROW consumer: 16-bit inputs stay at
          storage width (no promote — the narrow evaluator computes in
          i16 directly); stage values pass through in whatever width
          they carry (the evaluator truncates, exact mod 2^16)."""
          if name in stage_vals or name in stage_vals_T:
            return parent_val(name)
          if name not in input_vals_nw:
            k = stencil.input_names.index(name)
            input_vals_nw[name] = slabs[k][slot if not single else 0]
          return input_vals_nw[name], slab_margins[name]

        def parent_val_full(name):
          """Parent value at FULL slab extent (roll mode: stage values
          are never trimmed; shifted reads rotate in place)."""
          if name in stage_vals:
            return stage_vals[name]
          return parent_val(name)[0]  # inputs are full-extent already

        def parent_val_T(name):
          """Parent value in transposed (lane-major) layout."""
          if name not in stage_vals_T:
            stage_vals_T[name] = parent_val(name)[0].T
          return stage_vals_T[name], slab_margins[name]

        def parent_val_full_T(name):
          """Parent value at FULL slab extent, transposed (roll-mode
          hybrid regions)."""
          if name not in stage_vals_T:
            stage_vals_T[name] = parent_val_full(name).T
          return stage_vals_T[name]

        def store_value(k, name, bases, val=None, window=None):
          """Store the valid region of an output stage value into the
          output block; ``bases`` maps blocked axis -> (static slab base,
          block extent). Unblocked axes store their whole interior.
          ``window=(off, length)`` restricts to an axis-0 sub-range of
          the stage's region (chunked mode), with ``val`` holding just
          those rows."""
          if val is None:
            val = parent_val(name)[0]  # lazily un-transposes region outputs
          store_dt = stencil.symbol_table[name].np_dtype
          m = slab_margins[name]
          out_idx, val_idx = [], []
          for a in range(dim):
            if a in bases:
              base, blk = bases[a]
              jlo = max(0, m[a][0] - base)
              jhi = min(blk, size[a] - m[a][1] - base)
              if jlo >= jhi:
                return  # whole block is globally-invalid border
              v0 = base - m[a][0] + jlo
              if a == 0 and window is not None:
                off, length = window
                wv0 = max(v0, off)
                wv1 = min(v0 + (jhi - jlo), off + length)
                if wv0 >= wv1:
                  return  # chunk misses this block entirely
                out_idx.append(slice(jlo + (wv0 - v0), jlo + (wv1 - v0)))
                val_idx.append(slice(wv0 - off, wv1 - off))
              else:
                out_idx.append(slice(jlo, jhi))
                val_idx.append(slice(v0, v0 + (jhi - jlo)))
            else:
              out_idx.append(slice(m[a][0], size[a] - m[a][1]))
              val_idx.append(slice(None))
          val = val[tuple(val_idx)]
          if val.dtype != store_dt:
            # promoted-width integer value -> storage width; exact: the
            # value is already wrapped into the storage type's range
            val = val.astype(store_dt)
          if out_dma:
            out_stage[k][(slot_out,) + tuple(out_idx)] = val
          else:
            out_refs[k][tuple(out_idx)] = val

        def class_cond(kind, p, nb, stream_axis=False):
          if kind in (None, 'all'):
            return None
          if stream_axis and steady:
            # i in [2, n-3]: statically interior
            return None if kind == 'mid' else False
          if isinstance(p, int):  # peeled boundary step: fold now
            if kind == 'first':
              return p == 0
            if kind == 'mid':
              return 0 < p < nb - 1
            return p == nb - 1  # tail
          if kind == 'first':
            return p == 0
          if kind == 'mid':
            return jnp.logical_and(p > 0, p < nb - 1)
          return p == nb - 1  # tail

        def store_all_classes(k, name, val=None, window=None):
          """Emit the (stream x mid) block-class-conditional stores of
          one output value (or an axis-0 chunk of it)."""
          for cs_kind, cs_base in stream_classes:
            for cm_kind, cm_base in mid_classes:
              bases = {0: (cs_base, b)}
              if mid_blocked:
                bases[1] = (cm_base, mt)
              conds = [
                  c for c in (class_cond(cs_kind, i, n, stream_axis=True),
                              class_cond(cm_kind, jm, self.grid_m))
                  if c is not None and c is not True
              ]
              if any(c is False for c in conds):
                continue  # statically impossible block class
              if not conds:
                store_value(k, name, bases, val, window)
                continue
              cond = conds[0]
              for extra in conds[1:]:
                cond = jnp.logical_and(cond, extra)

              @pl.when(cond)
              def _(k=k, name=name, bases=bases, val=val, window=window):
                store_value(k, name, bases, val, window)

        for stage in plan.stages:
          st_idx = stage.tensor.st_idx
          region = _region(stage.name)

          if value_mode and roll_mode and stage.name in transposed:
            # hybrid region stage (2-D): operands arrive transposed at
            # full slab extent; a lane-logical shift is an axis-0 roll
            # of the transposed value, a sublane-logical shift a lane
            # roll. Wrap garbage lands in globally-invalid border cells
            # either way (the same exemptions as plain roll mode).
            def load(ref: ir.Ref, _st=st_idx):
              if ref.name in stencil.param_names:
                return params[ref.name][tuple(ref.idx)]
              lane_delta = ref.idx[0] - _st[0]
              sub_delta = ref.idx[1] - _st[1]
              key = (ref.name, lane_delta, sub_delta)
              if key in roll_cache_T:
                _ROLL_STATS['reused'] += 1
                if _ROLL_CSE:
                  return roll_cache_T[key]
              else:
                _ROLL_STATS['computed'] += 1
              v = parent_val_full_T(ref.name)
              if lane_delta:
                v = axis_roll(v, lane_delta, 0)
              if sub_delta:
                v = lane_roll(v, sub_delta)
              roll_cache_T[key] = v
              return v
          elif value_mode and roll_mode:
            def load(ref: ir.Ref, _st=st_idx):
              if ref.name in stencil.param_names:
                return params[ref.name][tuple(ref.idx)]
              deltas = tuple(ref.idx[d] - _st[d] for d in range(dim))
              key = (ref.name, deltas)
              if key in roll_cache:
                _ROLL_STATS['reused'] += 1
                if _ROLL_CSE:
                  return roll_cache[key]
              else:
                _ROLL_STATS['computed'] += 1
              v = parent_val_full(ref.name)
              for a in range(dim - 1):
                d = dim - 1 - a
                delta = deltas[d]
                if delta:
                  v = axis_roll(v, delta, a)
              if deltas[0]:
                v = lane_roll(v, deltas[0])
              roll_cache[key] = v
              return v
          elif value_mode and stage.name in transposed:
            # transposed-region stage: identical slicing math with the
            # two axes walked in swapped order against lane-major values
            def load(ref: ir.Ref, _st=st_idx, _region=region):
              if ref.name in stencil.param_names:
                return params[ref.name][tuple(ref.idx)]
              src, p_m = parent_val_T(ref.name)
              idx = []
              for a in (1, 0):
                d = dim - 1 - a
                delta = ref.idx[d] - _st[d]
                idx.append(slice(_region[a].start + delta - p_m[a][0],
                                 _region[a].stop + delta - p_m[a][0]))
              return src[tuple(idx)]
          elif value_mode:
            def load(ref: ir.Ref, _st=st_idx, _region=region,
                     _pv=(parent_val_nw if stage.name in narrow16
                          else parent_val)):
              if ref.name in stencil.param_names:
                return params[ref.name][tuple(ref.idx)]
              src, p_m = _pv(ref.name)
              idx = []
              for a in range(n_margin_axes):
                d = dim - 1 - a
                delta = ref.idx[d] - _st[d]
                idx.append(slice(_region[a].start + delta - p_m[a][0],
                                 _region[a].stop + delta - p_m[a][0]))
              if rotate_lanes:
                idx.append(slice(None))
              value = src[tuple(idx)]
              if rotate_lanes:
                lane_delta = ref.idx[0] - _st[0]
                if lane_delta:
                  value = lane_roll(value, lane_delta)
              return value
          else:
            def load(ref: ir.Ref, _st=st_idx, _region=region, _off=0,
                     _len=None):
              if ref.name in stencil.param_names:
                return params[ref.name][tuple(ref.idx)]
              src, lead = parent_ref(ref.name)
              idx = list(lead)
              for a in range(n_margin_axes):
                d = dim - 1 - a
                delta = ref.idx[d] - _st[d]
                start = _region[a].start + delta
                stop = _region[a].stop + delta
                if a == 0 and _len is not None:
                  start += _off
                  stop = start + _len
                idx.append(slice(start, stop))
              if rotate_lanes:
                idx.append(slice(None))
              value = src[tuple(idx)]
              if rotate_lanes:
                lane_delta = ref.idx[0] - _st[0]
                if lane_delta:
                  value = lane_roll(value, lane_delta)
              return value

          def param(name, idx):
            return params[name][idx]

          if value_mode:
            is_narrow = stage.name in narrow16
            evaluator = semantics.Evaluator(jnp, load, param=param,
                                            fast_int_div=True,
                                            fast_rsqrt=True,
                                            narrow=is_narrow)
            value, _ = evaluator.eval_stmt(stage.tensor)
            if is_narrow:
              # value is already wrapped mod 2^16 by construction; carry
              # it in the declared type's signedness so non-ring
              # consumers of a 16-bit stage extend it correctly. For
              # >16-bit declared stages any 16-bit form works (consumers
              # were proven to need the value mod 2^16 only).
              rep = stage.dtype.np_dtype \
                  if stage.dtype.width_in_bits == 16 else np.dtype('int16')
              if getattr(value, 'dtype', None) != rep:
                value = jnp.asarray(value).astype(rep)
            else:
              value = semantics.wrap_promoted(
                  jnp, value, stage.dtype,
                  wrap_free.get(stage.name, False))
            if stage.name in transposed:
              stage_vals_T[stage.name] = value
            else:
              stage_vals[stage.name] = value
          elif chunk is not None:
            # chunked evaluation: sub-ranges of the region's axis 0, so
            # Mosaic's live fold temporaries are chunk-sized; childless
            # outputs store each chunk straight into the output block
            # (no slab slot at all)
            direct = stage.name in direct_outs
            extent = region[0].stop - region[0].start
            for off in range(0, extent, chunk):
              clen = min(chunk, extent - off)

              def c_load(ref: ir.Ref, _off=off, _len=clen, _load=load):
                return _load(ref, _off=_off, _len=_len)

              evaluator = semantics.Evaluator(jnp, c_load, param=param,
                                              fast_int_div=True,
                                              fast_rsqrt=True)
              value, _ = evaluator.eval_stmt(stage.tensor)
              value = semantics.wrap(jnp, value, stage.dtype)
              if direct:
                store_all_classes(stencil.output_names.index(stage.name),
                                  stage.name, val=value,
                                  window=(off, clen))
              else:
                sub = (slice(region[0].start + off,
                             region[0].start + off + clen),) + region[1:]
                stage_refs[stage.name][sub] = value
            if not direct and stage.name in stencil.output_names:
              # the value-mode store path handles (possibly mid-blocked)
              # output stores; feed it the finished slab region
              stage_vals[stage.name] = stage_refs[stage.name][region]
          else:
            evaluator = semantics.Evaluator(jnp, load, param=param,
                                            fast_int_div=True,
                                            fast_rsqrt=True)
            value, _ = evaluator.eval_stmt(stage.tensor)
            stage_refs[stage.name][region] = semantics.wrap(
                jnp, value, stage.dtype)

        # un-transpose region outputs at TOP level: the conditional store
        # branches below share parent_val's cache, and a transpose first
        # materialized inside one pl.when branch would leak into the
        # others as a captured constant
        for name in stencil.output_names:
          if name in transposed:
            parent_val(name)

        def full_store(k, val):
          if out_dma:
            out_stage[k][slot_out] = val
          else:
            out_refs[k][:] = val

        for k, name in enumerate(stencil.output_names):
          if value_mode or chunk is not None:
            if name not in direct_outs:
              # roll-mode values are full slab extent; the store math
              # expects the region-shaped view
              val = stage_vals[name][_region(name)] if roll_mode else None
              store_all_classes(k, name, val=val)
            continue
          src = stage_refs[name]
          if single:
            out_refs[k][:] = src[:]
            continue
          # output block row j = slab row base + j; base is static per
          # block class, so these are plain static slices
          if base_first == base_mid == base_tail:
            full_store(k, src[base_mid:base_mid + b])
            continue

          @when((i == 0) if isinstance(i, int) else
                False if steady else i == 0)
          def _(k=k, src=src):
            full_store(k, src[base_first:base_first + b])

          @when((0 < i < n - 1) if isinstance(i, int) else
                True if steady else jnp.logical_and(i > 0, i < n - 1))
          def _(k=k, src=src):
            full_store(k, src[base_mid:base_mid + b])

          @when((i == n - 1) if isinstance(i, int) else
                False if steady else jnp.logical_and(i == n - 1, n > 1))
          def _(k=k, src=src):
            full_store(k, src[base_tail:base_tail + b])

        if out_dma:
          for k in range(n_out):
            out_copy(k, slot_out, i, jm).start()

          @when(False if steady else step == total - 1)
          def _():
            if total > 1:  # the previous step's copy is still in flight
              for k in range(n_out):
                out_copy(k, 1 - slot_out, i, jm).wait()
            for k in range(n_out):
              out_copy(k, slot_out, i, jm).wait()

      if stream_loop:
        from jax import lax
        peel = stream_peel and n >= 4

        def tile(jm_):
          if peel:
            # boundary steps traced with STATIC i (their class
            # predicates fold away); the interior runs a steady body
            # with every stream-class branch pruned at trace time
            _step(jm_, 0)
            _step(jm_, 1)
            if n > 4:  # n == 4 would trace a dead zero-trip body
              lax.fori_loop(
                  2, n - 2,
                  lambda s_, c: (_step(jm_, s_, steady=True), c)[1], 0)
            _step(jm_, n - 2)
            _step(jm_, n - 1)
          else:
            lax.fori_loop(0, n,
                          lambda s_, c: (_step(jm_, s_), c)[1], 0)

        if mid_blocked:
          if peel and self.grid_m <= 4:
            # mid-axis peel: few mid tiles unroll with STATIC jm, so
            # every mid-class predicate and DMA offset folds at trace
            # time too (the 256^3 topology is grid_m=2)
            for j_ in range(self.grid_m):
              tile(j_)
          else:
            lax.fori_loop(0, self.grid_m,
                          lambda j_, c: (tile(j_), c)[1], 0)
        else:
          tile(0)
      elif mid_blocked:
        _step(pl.program_id(0), pl.program_id(1))
      else:
        _step(0, pl.program_id(0))

    if stream_loop:
      grid = ()  # one invocation; _step loops over all blocks inside
    else:
      grid = ((self.grid_m, self.grid) if mid_blocked else (self.grid,))
    # inputs pinned to HBM and DMA'd manually (blocked specs cannot
    # express overlapping halo windows)
    hbm = pl.ANY if interpret else pltpu.HBM
    in_specs = [pl.BlockSpec(memory_space=hbm)] * n_in
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_par
    if out_dma:
      # outputs stay whole HBM refs; the kernel DMAs staged blocks out
      out_specs = [pl.BlockSpec(memory_space=hbm)] * n_out
    elif mid_blocked:
      out_specs = [
          pl.BlockSpec(out_block, lambda j_, i_: (i_, j_, 0),
                       memory_space=pltpu.VMEM)
      ] * n_out
    elif single:
      out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out
    else:
      out_specs = [
          pl.BlockSpec(out_block, lambda i: (i,) + (0,) * (dim - 1),
                       memory_space=pltpu.VMEM)
      ] * n_out
    out_shape = [
        jax.ShapeDtypeStruct(pad_shape, stencil.symbol_table[name].np_dtype)
        for name in stencil.output_names
    ]
    n_buf = depth
    scratch_shapes = [
        pltpu.VMEM((n_buf, s) + rest, input_types[name].np_dtype)
        for name in stencil.input_names
    ]
    scratch_shapes += [
        pltpu.SemaphoreType.DMA((n_buf,)) for _ in stencil.input_names
    ]
    scratch_shapes += [
        pltpu.VMEM((s,) + rest, dt) for dt in slot_dtypes
    ]
    if out_dma:
      scratch_shapes += [
          pltpu.VMEM((2,) + out_block,
                     stencil.symbol_table[name].np_dtype)
          for name in stencil.output_names
      ]
      scratch_shapes += [
          pltpu.SemaphoreType.DMA((2,)) for _ in stencil.output_names
      ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shape if n_out > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',) * len(grid),
        ),
        interpret=interpret,
    )

    real_shape = self.shape
    pads = tuple(
        (0, p - r) for p, r in zip(pad_shape, real_shape))
    needs_pad = pad_shape != real_shape
    crop = tuple(slice(0, r) for r in real_shape)

    def fn(*arrays):
      n_args = len(stencil.input_names)
      ins = arrays[:n_args]
      pars = arrays[n_args:]
      if needs_pad:
        padded = tuple(jnp.pad(a, pads) for a in ins)
      else:
        padded = ins
      outs = call(*padded, *pars)
      if not isinstance(outs, (list, tuple)):
        outs = (outs,)
      if needs_pad:
        outs = tuple(o[crop] for o in outs)
      if stencil.preserve_border and self.apply_preserve_border:
        # border: preserve — boundary cells carry the paired input
        from soda_tpu.backend.reference import preserve_border_fixup
        in_pos = {n: i for i, n in enumerate(stencil.input_names)}
        fixed = preserve_border_fixup(
            jnp, stencil, real_shape, lambda n: ins[in_pos[n]],
            dict(zip(stencil.output_names, outs)))
        outs = tuple(fixed[n] for n in stencil.output_names)
      return outs

    return fn

  # -- execution ----------------------------------------------------------------
  def prepare(self, inputs: Mapping[str, np.ndarray],
              params: Optional[Mapping[str, np.ndarray]] = None):
    return _prepare_args(self, inputs, params)

  @property
  def fn(self):
    """Jitted positional callable: fn(*inputs, *params) -> (outputs...)."""
    return self._fn

  def __call__(self,
               inputs: Mapping[str, np.ndarray],
               params: Optional[Mapping[str, np.ndarray]] = None
               ) -> Dict[str, np.ndarray]:
    outs = self._fn(*self.prepare(inputs, params))
    return dict(zip(self.stencil.output_names, outs))


class MidTiledPallasExecutor(PallasExecutor):
  """Fused Pallas kernel over mid-dimension tiles (3-D grids whose
  cross-section exceeds the VMEM slab budget).

  The mid axis (array axis 1) joins the Pallas grid as halo-overlapped
  sub-slabs — the in-grid analog of the reference host's
  halo-overlapped spatial tiling (host.py:641-701). Tiles pipeline
  through the same double-buffered DMA as streaming blocks (round-1
  ran them as a serialized Python loop of kernel calls); extra HBM
  traffic is only the duplicated mid halos (halo/tile fraction).
  """

  def __init__(self, stencil, shape: Tuple[int, ...],
               mid_tile: Optional[int] = None, **kwargs):
    if len(shape) != 3:
      raise utils.InputError('mid tiling applies to 3-D grids only')
    if mid_tile is None:
      plan = make_plan(stencil, 'full')
      h, m, w_ = shape
      mlo = _pad_to(plan.halo_lo[1], _ALIGN)
      mhi = plan.halo_hi[1]
      prefetch = int(kwargs.get('prefetch', 2))
      mid_tile = m
      while mid_tile > 8:
        ext = min(m, _pad_to(mid_tile + mlo + mhi, _ALIGN))
        if estimate_vmem(plan, (h, ext, w_), 8, 'value',
                         prefetch=prefetch) <= _VMEM_BUDGET:
          break
        mid_tile //= 2
      mid_tile = max(8, mid_tile)
    try:
      super().__init__(stencil, shape, mid_tile=mid_tile, **kwargs)
    except utils.InputError as e:
      # wide-fold stencils auto-resolve to the vmem stage mode, which
      # plain mid tiling cannot store through; chunked evaluation can
      if ('stage_mode=value' in str(e) and
          kwargs.get('compute_chunk') is None):
        super().__init__(stencil, shape, mid_tile=mid_tile,
                         compute_chunk=8, **kwargs)
      else:
        raise

  @property
  def n_tiles(self) -> int:
    return self.grid_m


def _prepare_args(executor, inputs: Mapping[str, np.ndarray],
                  params: Optional[Mapping[str, np.ndarray]] = None):
  """Wrap + device-put arguments (positional order for executor.fn)."""
  import jax
  import jax.numpy as jnp
  stencil = executor.stencil
  args = []
  for name in stencil.input_names:
    if name not in inputs:
      raise utils.InputError('missing input: %s' % name)
    arr = jnp.asarray(inputs[name])
    if arr.shape != executor.shape:
      raise utils.InputError('input %s shape %s != compiled shape %s' %
                             (name, arr.shape, executor.shape))
    args.append(
        jax.device_put(semantics.wrap(jnp, arr,
                                      stencil.symbol_table[name])))
  params = dict(params or {})
  for name in stencil.param_names:
    if name not in params:
      raise utils.InputError('missing param: %s' % name)
    args.append(jax.device_put(jnp.asarray(params[name])))
  return tuple(args)
