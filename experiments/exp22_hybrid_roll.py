"""Round-3 experiment 22: roll-shift + transposed lane regions hybrid.

Round-3 roll mode lost on erosion (-7%) and sobel2d (-20%) because it
replaced the measured-best transposed lane regions with lane rotates.
The hybrid keeps both: lane-only chains evaluate transposed at full
slab extent (lane-logical shifts = axis-0 rolls of the transposed
value), everything else rolls as in plain roll mode — so the sublane
chain's misaligned windowed slices (~4.5 slots) become rolls (~1.5)
while the lane chain keeps its measured-2.3x-cheaper transposed form.

Seeds to beat: erosion 0.34 (slice + transposed), xcorr 0.30 (roll),
sobel2d 0.56 (slice + separable).

Run ON TPU (alone): python experiments/exp22_hybrid_roll.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


CASES = (
    # (name, overrides, opts, seed frac)
    ('erosion', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 256, 'transpose_lanes': 'on'}, 0.34),
    ('erosion', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 128, 'transpose_lanes': 'on'}, 0.34),
    ('xcorr', {'optimizations': {'computation-reuse': 'greedy'}},
     {'block_rows': 256, 'transpose_lanes': 'on'}, 0.30),
    ('sobel2d', {}, {'block_rows': 256, 'transpose_lanes': 'on'}, 0.56),
)


def main():
  import jax
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))
  shape = (8192, 2048)

  for name, ov, opts, seed in CASES:
    try:
      stencil = corpus.build(name, tile_size=(2048, 0), **ov)
      ex = PallasExecutor(stencil, shape, stage_mode='value',
                          shift_mode='roll', **opts)
      inputs = reference.make_test_inputs(stencil, shape)
      args = list(ex.prepare(inputs))
      in_b, out_b = stream_bytes(stencil, shape)
      dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                          (in_b + out_b) / (peak * 1e9))
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('>>> %-8s hybrid %s  %.3f  (seed %.2f, %+0.1f%%)  %.3f ms '
          'c=%.0fs' % (name, opts, frac, seed,
                       100 * (frac / seed - 1), dt * 1e3, cs))
    except Exception as e:  # noqa: BLE001
      log('%-8s hybrid FAILED: %s' %
          (name, str(e).splitlines()[0][:110]))


if __name__ == '__main__':
  main()
