"""Round-3 experiment 30: decompose the ~2us/step fixed cost.

exp27 asks "is it the Pallas grid?" (grid vs in-kernel fori_loop at
one granularity). This probe holds the TOTAL bytes fixed (a 256^3 f32
pass, read+write) and sweeps the two remaining suspects on the
loop-db form (one kernel entry, double-buffered manual DMA):

  blk sweep   : BLK in {2, 4, 8, 16} plane-rows per step — if the
                per-step cost is fixed (grant chain + scalar
                bookkeeping), small-BLK runs inflate proportionally
                to step count; if bandwidth-bound, all land at the
                same roofline fraction.
  split sweep : BLK=4 with each step's in-copy issued as 1, 2, or 4
                separate DMAs (same bytes) — isolates the per-DMA
                grant/issue cost from the per-step loop cost.
  depth sweep : BLK=4 with prefetch depth 2 (double) vs 3 (triple
                buffer) — if the in-DMA latency (not issue cost) is
                the wall, depth 3 hides one more step of it.

Run ON TPU (alone): python experiments/exp30_dma_granularity.py
CPU correctness check: python experiments/exp30_dma_granularity.py interpret
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from soda_tpu.profiling import peak_bandwidth, slope_time

  interpret = 'interpret' in sys.argv[1:]
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  peak = peak_bandwidth(jax.devices()[0])
  log('device: %s peak %.0f GB/s' % (jax.devices()[0], peak))

  N = 64 if interpret else 256
  bytes_moved = 2 * N * N * N * 4
  est = bytes_moved / (peak * 1e9)

  def make_loop_db(blk, split=1, depth=2):
    """One-entry kernel: fori_loop over N//blk steps, depth-buffered
    input slabs, each step's in-copy issued as `split` DMAs."""
    steps = N // blk
    sub = blk // split
    assert sub * split == blk

    def in_copies(i, slot, in_hbm, vin, sin):
      return [
          pltpu.make_async_copy(
              in_hbm.at[pl.ds(i * blk + p * sub, sub)],
              vin.at[slot, pl.ds(p * sub, sub)], sin.at[slot])
          for p in range(split)
      ]

    def out_copy(i, slot, out_hbm, vout, sout):
      return pltpu.make_async_copy(
          vout.at[slot], out_hbm.at[pl.ds(i * blk, blk)], sout.at[slot])

    def body(i, in_hbm, out_hbm, vin, vout, sin, sout):
      slot = lax.rem(i, depth)
      o_slot = lax.rem(i, 2)

      # start the fill depth-1 steps ahead
      @pl.when(i + depth - 1 < steps)
      def _():
        for cp in in_copies(i + depth - 1, lax.rem(i + depth - 1, depth),
                            in_hbm, vin, sin):
          cp.start()

      for cp in in_copies(i, slot, in_hbm, vin, sin):
        cp.wait()
      vout[o_slot] = vin[slot] + jnp.float32(1)

      @pl.when(i > 0)
      def _():
        out_copy(i - 1, 1 - o_slot, out_hbm, vout, sout).wait()

      out_copy(i, o_slot, out_hbm, vout, sout).start()

      @pl.when(i == steps - 1)
      def _():
        out_copy(i, o_slot, out_hbm, vout, sout).wait()

    def kernel(in_hbm, out_hbm, vin, vout, sin, sout):
      # warm the pipeline: fills for steps 0..depth-2
      for w in range(depth - 1):
        if w < steps:
          for cp in in_copies(w, w % depth, in_hbm, vin, sin):
            cp.start()
      lax.fori_loop(
          0, steps,
          lambda i, c: (body(i, in_hbm, out_hbm, vin, vout, sin, sout),
                        c)[1], 0, unroll=False)

    hbm = pl.ANY if interpret else pltpu.HBM
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=hbm)],
        out_specs=pl.BlockSpec(memory_space=hbm),
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, blk, N, N), jnp.float32),
            pltpu.VMEM((2, blk, N, N), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    ), steps

  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((N, N, N), dtype=np.float32))
  want = np.asarray(x) + 1

  cases = [
      ('blk2', dict(blk=2)),
      ('blk4 (exp27 ref)', dict(blk=4)),
      ('blk8', dict(blk=8)),
      ('blk16', dict(blk=16)),
      ('blk4 split2', dict(blk=4, split=2)),
      ('blk4 split4', dict(blk=4, split=4)),
      ('blk4 depth3', dict(blk=4, depth=3)),
      ('blk2 depth3', dict(blk=2, depth=3)),
      ('blk2 depth4', dict(blk=2, depth=4)),
  ]
  for tag, kw in cases:
    if interpret and kw.get('blk', 4) > N:
      continue
    try:
      call, steps = make_loop_db(**kw)
      got = np.asarray(jax.jit(call)(x))
      ok = np.array_equal(got, want)
      if interpret:
        log('%-18s %s' % (tag, 'OK' if ok else 'WRONG'))
        continue
      fn = lambda a, call=call: (call(a),)
      dt, cs = slope_time(fn, [x], 0, est)
      frac = bytes_moved / dt / 1e9 / peak
      log('>>> %-18s %.3f ms  roofline=%.3f  per-step %.2f us  %s'
          % (tag, dt * 1e3, frac, dt * 1e6 / steps,
             'OK' if ok else 'WRONG'))
    except Exception as e:  # noqa: BLE001
      log('%-18s FAILED: %s' % (tag, str(e).splitlines()[0][:130]))


if __name__ == '__main__':
  main()
