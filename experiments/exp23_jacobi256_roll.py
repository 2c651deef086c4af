"""Round-3 experiment 23: 256^3 jacobi3d, roll mode composed with mid
tiling. Result: NEUTRAL (0.445-0.451 vs the r2 window best 0.447) --
third confirmation that the ~2us per-grid-step fixed cost (input-DMA
grant chain + scalar bookkeeping), not per-step compute, caps this
topology; roll+mid is nonetheless correct (bit-exact) and supported.

Run ON TPU (alone): python experiments/exp23_jacobi256_roll.py
"""
import sys
sys.path.insert(0, '/root/repo')

def log(*a):
  print(*a, flush=True)

import jax
from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                slope_time, stream_bytes)
import numpy as np

peak = peak_bandwidth(jax.devices()[0])
log('device: %s peak %.0f' % (jax.devices()[0], peak))
shape = (256, 256, 256)
stencil = corpus.build('jacobi3d', tile_size=(256, 256, 0))
inputs = reference.make_test_inputs(stencil, shape)
want = reference.run(stencil, inputs)

for label, kw in (
    ('mid128 window (r2 best)', {'mid_tile': 128}),
    ('mid128 roll', {'mid_tile': 128, 'stage_mode': 'value',
                     'shift_mode': 'roll'}),
    ('mid64 roll', {'mid_tile': 64, 'stage_mode': 'value',
                    'shift_mode': 'roll'}),
):
  try:
    ex = MidTiledPallasExecutor(stencil, shape, **kw)
    got = ex(inputs)
    out = stencil.output_names[0]
    region = reference.output_valid_slices(stencil, shape, out)
    ok = np.array_equal(np.asarray(got[out])[region], want[out][region]) \
        if not stencil.symbol_table[out].is_float else \
        np.allclose(np.asarray(got[out])[region], want[out][region],
                    rtol=1e-5, atol=1e-5)
    args = list(ex.prepare(inputs))
    in_b, out_b = stream_bytes(stencil, shape)
    dt, cs = slope_time(ex.fn, args, chain_input_index(stencil),
                        (in_b + out_b) / (peak * 1e9))
    frac = (in_b + out_b) / dt / 1e9 / peak
    log('>>> %-22s %.3f  %.3f ms  ok=%s c=%.0fs  blk=%d' %
        (label, frac, dt * 1e3, ok, cs, ex.block_rows))
  except Exception as e:  # noqa: BLE001
    log('%-22s FAILED: %s' % (label, str(e).splitlines()[0][:110]))
