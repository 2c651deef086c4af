"""Round-5 experiment 47: is the cross-process timing swing caused by
process HISTORY (allocations / prior kernels / XLA baselines) or by
process-start lottery?

exp46 measured denoise2d roll-b128 at 0.282 ms; the record run two
hours later (same source, same fleet day) measured the same config at
0.387 ms in its budget-exempt seed pass. Both processes had compiled
and measured several kernels first, but the mixes differed. In ONE
process:

  1. FRESH: measure denoise2d roll-b128 3x with nothing else done.
  2. HISTORY: build + 1-rep-measure five other bench seeds (blur roll,
     jacobi2d peel, heat3d roll, erosion hybrid, contrast CR) and run
     the XLA whole-grid executor on blur + denoise2d — a bench-like
     allocation/compile mix.
  3. RE-MEASURE: the SAME compiled fn/args 3x, then a FRESH executor
     with freshly prepared args 3x.

If 3 == 1, history is irrelevant (the swing is process-start or
slow-drift state we cannot control); if 3 is slower, the bench can be
restructured (free args, measure before baselines, etc.).

Run ON TPU (alone): python experiments/exp47_process_state.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.backend.xla import XlaExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes, peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f' % (jax.devices()[0], peak))

  rows = {r[0]: r for r in bench_mod.CONFIGS}
  name = 'denoise2d'
  _, shape, overrides, _ = rows[name][:4]
  stencil = corpus.build(name, **overrides)
  cfg = {'block_rows': 128, 'stage_mode': 'value', 'shift_mode': 'roll'}
  in_b, out_b = stream_bytes(stencil, shape)
  est = (in_b + out_b) / (peak * 1e9)
  chain = chain_input_index(stencil)

  def triple(tag, fn, args):
    for i in range(3):
      dt, _ = slope_time(fn, args, chain, est, reps=2)
      frac = (in_b + out_b) / dt / 1e9 / peak
      log('%-22s #%d %.3f ms frac=%.3f' % (tag, i, dt * 1e3, frac))

  # 1. FRESH
  ex = PallasExecutor(stencil, shape, **cfg)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  triple('fresh', ex.fn, args)

  # 2. HISTORY: a bench-like compile/alloc mix
  for other in ('blur', 'jacobi2d', 'heat3d', 'erosion', 'contrast'):
    oname, oshape, oover, oseeds = rows[other][:4]
    ost = corpus.build(oname, **oover)
    try:
      oex = PallasExecutor(ost, oshape, **oseeds[0])
      oin = reference.make_test_inputs(ost, oshape)
      oargs = list(oex.prepare(oin))
      odt, _ = slope_time(oex.fn, oargs, chain_input_index(ost),
                          sum(stream_bytes(ost, oshape)) / (peak * 1e9),
                          reps=1)
      log('history %-10s %.3f ms' % (oname, odt * 1e3))
    except Exception as e:  # noqa: BLE001
      log('history %-10s FAILED %s' % (oname, str(e).splitlines()[0][:50]))
  for xname in ('blur', 'denoise2d'):
    xn, xshape, xover, _ = rows[xname][:4]
    xst = corpus.build(xn, **xover)
    xex = XlaExecutor(xst, xshape)
    xin = reference.make_test_inputs(xst, xshape)
    xargs = list(xex.prepare(xin))
    xdt, _ = slope_time(xex.fn, xargs, chain_input_index(xst),
                        sum(stream_bytes(xst, xshape)) / (peak * 1e9),
                        reps=1)
    log('history xla %-8s %.3f ms' % (xn, xdt * 1e3))

  # 3. RE-MEASURE
  triple('re-measure same fn', ex.fn, args)
  ex2 = PallasExecutor(stencil, shape, **cfg)
  inputs2 = reference.make_test_inputs(stencil, shape)
  args2 = list(ex2.prepare(inputs2))
  triple('fresh executor+args', ex2.fn, args2)


if __name__ == '__main__':
  main()
