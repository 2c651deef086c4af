"""Hardware auto-tuning with a persistent result cache.

The reference caches its AutoBridge floorplan keyed by the exact
stencil text (cluster.py:104-160) because the expensive tool run is
deterministic in it. The TPU analog: the fastest (block_rows,
lane_shift) configuration of the fused kernel is a hardware property
of (stencil, shape, device); probe it once on the attached TPU and
cache it under the same kind of key.

Usage:
  from soda_tpu.tools.autotune import tune, tuned_executor
  cfg = tune(stencil, shape)               # {'block_rows': .., ...}
  ex = tuned_executor(stencil, shape)      # executor built with cfg

CLI: ``python -m soda_tpu <file.soda> --run --tune``.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from typing import Dict, Tuple

_logger = logging.getLogger().getChild(__name__)

DEFAULT_CACHE = '~/.cache/soda_tpu_tune.json'


def _key(stencil, shape, device_kind: str) -> str:
  text = '%s|%s|%s' % (stencil, shape, device_kind)
  return hashlib.sha256(text.encode()).hexdigest()[:24]


def _load(path: str) -> Dict:
  try:
    with open(path) as f:
      return json.load(f)
  except (OSError, ValueError):
    return {}


def _store(path: str, table: Dict) -> None:
  os.makedirs(os.path.dirname(path), exist_ok=True)
  tmp = path + '.tmp'
  with open(tmp, 'w') as f:
    json.dump(table, f, indent=1)
  os.replace(tmp, path)


def _time_config(stencil, shape, cfg: Dict, reps: int = 2) -> float:
  """Median wall time of one application (compile excluded)."""
  import jax
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor

  ex = PallasExecutor(stencil, shape, **cfg)
  inputs = reference.make_test_inputs(stencil, shape)
  params = reference.make_test_params(stencil)
  args = ex.prepare(inputs, params)
  jax.block_until_ready(ex.fn(*args))  # compile + warm up

  # chain a handful of dependent applications so device time dominates
  # the dispatch/fetch noise of tunneled attachments
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes
  in_b, out_b = stream_bytes(stencil, shape)
  peak = 819e9  # only sets the chain length; any ballpark works
  dt, _ = slope_time(ex.fn, list(args), chain_input_index(stencil),
                     (in_b + out_b) / peak, reps=reps)
  return dt


def candidate_configs(stencil, shape) -> Tuple[Dict, ...]:
  from soda_tpu.backend import pallas_fits
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  if len(shape) == 3 and not pallas_fits(stencil, shape):
    # oversized cross-section: the config space is mid tiling x
    # stream block x chunked stage evaluation (compute_chunk bounds
    # Mosaic's fold temporaries, unlocking larger blocks)
    cands = []
    mts = [mt for mt in (8, 16, 32, 64, 128) if mt < shape[1]]
    for mt in mts[-3:]:  # the largest applicable tiles
      cands.append({'mid_tile': mt})
      # chunked evaluation bounds Mosaic's fold temporaries, making
      # larger stream blocks compile; also the fallback when the auto
      # stage-mode policy picks vmem (plain mid tiling needs value)
      cands.append({'mid_tile': mt, 'compute_chunk': 8})
      cands.append({'mid_tile': mt, 'block_rows': 32,
                    'compute_chunk': 8})
    if mts:
      # stream_loop: the whole grid inside one kernel invocation —
      # attacks the ~2us fixed per-grid-step cost that binds exactly
      # these many-step mid-tiled configs (exp27/exp28)
      cands.append({'mid_tile': mts[-1], 'stream_loop': 'peel'})
      cands.append({'mid_tile': mts[-1], 'stream_loop': True})
      # deep input prefetch (exp30/exp31): trades the rolling fill for
      # halo re-reads but hides depth-1 steps of DMA grant latency
      cands.append({'mid_tile': mts[-1], 'stream_loop': 'peel',
                    'prefetch': 3})
      # split slab fills: back-to-back sub-DMAs overlap grant latency
      # (exp30: +7% on the pure-DMA replay of this very pattern)
      cands.append({'mid_tile': mts[-1], 'stream_loop': 'peel',
                    'dma_split': 2})
    return tuple(cands) or ({},)
  base = PallasExecutor(stencil, shape)  # estimator's pick
  cands = [{'block_rows': base.block_rows}]
  for mult in (2, 4):
    cands.append({'block_rows': base.block_rows * mult})
  if len(shape) == 2 and shape[-1] > 256:
    # wide rows default to lane slices; rotate sometimes wins
    cands.append({'block_rows': base.block_rows, 'lane_shift': 'rotate'})
    cands.append({'block_rows': base.block_rows * 2,
                  'lane_shift': 'rotate'})
  # roll-shift value mode (round 3): full-extent values, every shifted
  # load an in-register rotate — measured wins on denoise2d/3d (+28%),
  # heat3d (full roofline), seidel2d/xcorr (+4%); losses elsewhere, so
  # it stays a probed candidate rather than a default
  cands.append({'block_rows': base.block_rows, 'stage_mode': 'value',
                'shift_mode': 'roll'})
  cands.append({'block_rows': base.block_rows * 2,
                'stage_mode': 'value', 'shift_mode': 'roll'})
  if len(shape) == 2:
    # roll + transposed-lane-region hybrid (exp22): erosion +19%,
    # xcorr +15% over their previous best seeds
    cands.append({'block_rows': base.block_rows, 'stage_mode': 'value',
                  'shift_mode': 'roll', 'transpose_lanes': 'on'})
  if base.grid * base.grid_m >= 8:
    # stream_loop='peel': one kernel invocation for the whole grid,
    # boundary steps peeled — pays off only when the ~2us fixed
    # per-grid-step cost is a real fraction of the step (many cheap
    # steps; exp27/exp28)
    cands.append({'block_rows': base.block_rows, 'stream_loop': 'peel'})
    cands.append({'block_rows': base.block_rows, 'stream_loop': 'peel',
                  'prefetch': 3})
  if len(shape) >= 3:
    # split slab fills (3-D only: stream-axis offsets are plane
    # strides, no sublane-alignment constraint) — exp30 grant overlap
    cands.append({'block_rows': base.block_rows, 'dma_split': 2})
  return tuple(cands)


def tune(stencil, shape, cache_path: str = DEFAULT_CACHE,
         force: bool = False) -> Dict:
  """Probe candidate configs on the attached device; cache the winner.

  Returns executor kwargs ({'block_rows': N[, 'lane_shift': ..]}).
  Falls back to {} (estimator defaults) if every candidate fails.
  """
  import jax

  device_kind = getattr(jax.devices()[0], 'device_kind', 'unknown')
  path = os.path.expanduser(cache_path)
  key = _key(stencil, tuple(shape), device_kind)
  table = _load(path)
  if not force and key in table:
    return dict(table[key]['config'])

  best_cfg: Dict = {}
  best_dt = float('inf')
  try:
    candidates = candidate_configs(stencil, shape)
  except Exception as e:  # noqa: BLE001 - e.g. 1-D / over-VMEM stencil
    _logger.warning('tune: cannot build candidates (%s); untuned',
                    str(e).splitlines()[0][:80])
    return {}
  for cfg in candidates:
    t0 = time.time()
    try:
      dt = _time_config(stencil, shape, cfg)
    except Exception as e:  # noqa: BLE001 - Mosaic OOM etc: skip
      _logger.info('tune: %s failed (%s)', cfg,
                   str(e).splitlines()[0][:80])
      continue
    _logger.info('tune: %s -> %.3f ms (%.0fs)', cfg, dt * 1e3,
                 time.time() - t0)
    if dt < best_dt:
      best_dt, best_cfg = dt, dict(cfg)
  if best_dt == float('inf'):
    # every candidate failed (flaky tunnel / compile server): do NOT
    # pin the failure in the persistent cache — the next invocation
    # should re-probe a healthy device
    _logger.warning('tune: all candidates failed; not caching')
    return {}
  # merge-on-write: re-read the file so entries written concurrently
  # (bench.py shares this cache) survive the minutes-long probe loop
  table = _load(path)
  table[key] = {
      'stencil': stencil.app_name,
      'shape': list(shape),
      'device': device_kind,
      'config': best_cfg,
      'ms': round(best_dt * 1e3, 4),
  }
  try:
    _store(path, table)
  except OSError as e:  # pragma: no cover
    _logger.warning('tune cache not written: %r', e)
  return dict(best_cfg)


def tuned_executor(stencil, shape, cache_path: str = DEFAULT_CACHE,
                   **kwargs):
  from soda_tpu import utils
  from soda_tpu.backend import get_executor
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  cfg = tune(stencil, shape, cache_path)
  cfg.update(kwargs)
  try:
    return PallasExecutor(stencil, shape, **cfg)
  except utils.InputError:
    # stencils the fused kernel cannot take (f16 on TPU, over-VMEM,
    # 1-D, cluster coarse) go through the normal dispatch instead
    return get_executor(stencil, shape, 'auto')
