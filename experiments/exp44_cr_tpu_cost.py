"""Round-5 experiment 44: measure the TPU-priced CR schedule objective.

VERDICT r4 mandate 1 / SURVEY §7.3: the schedule search can now order
candidates by measured shift slots ('cr-cost': 'tpu' — alignment-aware
distances, +1-op trades allowed) instead of the reference
(num_ops, distance) tuple. CPU-side predictions (whole-plan op_model):
  contrast (native 'yes'): 899.0 -> 852.5 slots/cell (-5%, 38 aligned
    sublane shifts vs 4) — the only predicted WIN;
  xcorr (greedy/beam/yes): 78.5 -> 82.5-83.0 slots (predicted LOSS:
    the schedule-level proxy prices the normalized frame and does not
    know the transposed-hybrid executor swaps lane/sublane axes);
  seidel2d/erosion: schedules unchanged.
This measures contrast and xcorr A/B at their bench seed configs in
ONE process to decide per-kernel adoption.

Run ON TPU (alone): python experiments/exp44_cr_tpu_cost.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  import numpy as np
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import (chain_input_index, peak_bandwidth,
                                  slope_time, stream_bytes)

  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))

  cases = [
      # (kernel, shape, stencil overrides base, executor config)
      ('contrast', (32768, 512), {'tile_size': (512, 0)}, 'yes', {}),
      ('xcorr', (8192, 2048), {'tile_size': (2048, 0)}, 'greedy',
       {'block_rows': 352, 'stage_mode': 'value', 'shift_mode': 'roll',
        'transpose_lanes': 'on', 'lane_shift': 'rotate'}),
  ]
  for name, shape, base, method, cfg in cases:
    outs = {}
    ins = None
    for mode in ('ops', 'tpu'):
      opts = dict(base)
      opts['optimizations'] = {'computation-reuse': method,
                               'cr-cost': mode}
      try:
        st = corpus.build(name, **opts)
        if ins is None:
          ins = reference.make_test_inputs(st, shape)
        in_b, out_b = stream_bytes(st, shape)
        est = (in_b + out_b) / (peak * 1e9)
        chain = chain_input_index(st)
        ex = PallasExecutor(st, shape, **cfg)
        args = list(ex.prepare(ins))
        dt, cs = slope_time(ex.fn, args, chain, est, reps=2)
        frac = (in_b + out_b) / dt / 1e9 / peak
        out = st.output_names[0]
        sl = reference.output_valid_slices(st, shape, out)
        outs[mode] = (np.asarray(ex(ins)[out]), sl)
        log('%-9s cr-cost=%-3s  %.3f ms  frac %.3f  compile %.0fs' %
            (name, mode, dt * 1e3, frac, cs))
      except Exception as e:  # noqa: BLE001
        log('%-9s cr-cost=%-3s FAILED: %s' %
            (name, mode, str(e).splitlines()[0][:110]))
    if len(outs) == 2:
      # identical math, different trees: bit-exact on the intersected
      # valid region (reuse-var skew can shift each mode's region)
      inter = tuple(slice(max(a.start, b.start), min(a.stop, b.stop))
                    for a, b in zip(outs['ops'][1], outs['tpu'][1]))
      a, b = outs['ops'][0][inter], outs['tpu'][0][inter]
      log('%-9s cross-mode: %s' %
          (name, 'bit-exact' if np.array_equal(a, b) else
           'MAX DIFF %g' % np.max(np.abs(
               a.astype(np.float64) - b.astype(np.float64)))))


if __name__ == '__main__':
  main()
