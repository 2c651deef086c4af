"""Round-3 experiment 18: close the two XLA-ahead gaps.

BENCH r3 baselines: denoise3d speedup_vs_xla 0.81 (XLA 63% roofline vs
our 51%) and blur 0.91. Probes: the opt-in INLINE pass (folds the six
single-use diff stages into g — the reference's inline, core.py:136),
stage modes, and larger blocks.

Run ON TPU (alone): python experiments/exp18_denoise_blur.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))

  def run(name, shape, tag, overrides, opts):
    try:
      stencil = corpus.build(name, **overrides)
      ex = PallasExecutor(stencil, shape, **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> %-10s %-26s %.3f (%.3f ms, compile %.0fs)' %
          (name, tag, frac, dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('%-10s %-26s FAILED: %s' %
          (name, tag, str(e).splitlines()[0][:110]))

  d3 = {'tile_size': (128, 32, 0)}
  d3_shape = (2048, 32, 128)
  run('denoise3d', d3_shape, 'seed b64', d3, {'block_rows': 64})
  run('denoise3d', d3_shape, 'inline b64',
      dict(d3, optimizations={'inline': True}), {'block_rows': 64})
  run('denoise3d', d3_shape, 'inline b128',
      dict(d3, optimizations={'inline': True}), {'block_rows': 128})
  run('denoise3d', d3_shape, 'b128', d3, {'block_rows': 128})
  run('denoise3d', d3_shape, 'vmem b64', d3,
      {'block_rows': 64, 'stage_mode': 'vmem'})
  # chunked evaluation: stage temporaries become chunk-sized (closer
  # to XLA's tile-level fusion working set)
  run('denoise3d', d3_shape, 'chunk8 b128', d3,
      {'block_rows': 128, 'compute_chunk': 8})
  run('denoise3d', d3_shape, 'chunk16 b256', d3,
      {'block_rows': 256, 'compute_chunk': 16})

  bl = {'tile_size': (2048, 0)}
  bl_shape = (8192, 2048)
  run('blur', bl_shape, 'seed b512', bl, {'block_rows': 512})
  run('blur', bl_shape, 'b1024', bl, {'block_rows': 1024})
  run('blur', bl_shape, 'inline b512',
      dict(bl, optimizations={'inline': True}), {'block_rows': 512})
  run('blur', bl_shape, 'rotate b512', bl,
      {'block_rows': 512, 'lane_shift': 'rotate'})

  d2 = {'tile_size': (2048, 0)}
  d2_shape = (8192, 2048)
  run('denoise2d', d2_shape, 'seed b128', d2, {'block_rows': 128})
  run('denoise2d', d2_shape, 'inline b128',
      dict(d2, optimizations={'inline': True}), {'block_rows': 128})


if __name__ == '__main__':
  main()
