"""Round-3 experiment 27: is the ~2us/step fixed cost the Pallas GRID?

256^3 jacobi3d is pinned at 0.45 by a ~2us fixed cost per grid step
(exp17/exp19/exp23 refuted output sync, bigger blocks, roll+mid).
Untried candidate: the Pallas grid machinery itself (per-step kernel
re-entry + scalar prologue).  This probe runs the SAME slab-streaming
body (manual HBM->VMEM in-DMA, trivial compute, manual VMEM->HBM
out-DMA, 64 x (4,256,256) f32 chunks) two ways:

  grid : pl.pallas_call(grid=(64,)) — one kernel entry per step
  loop : pl.pallas_call(grid=())    — one entry, lax.fori_loop inside

plus double-buffered variants of both.  If loop beats grid by ~2us x
steps, the lever is real and worth a builder mode.

Run ON TPU (alone): python experiments/exp27_gridloop.py
CPU correctness check: python experiments/exp27_gridloop.py interpret
"""

import functools
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

  N, BLK = (64, 4) if interpret else (256, 4)
  steps = N // BLK
  bytes_moved = 2 * N * N * N * 4  # read once + write once
  est = bytes_moved / (peak * 1e9)

  def body_sync(i, in_hbm, out_hbm, vin, vout, sin, sout):
    cp = pltpu.make_async_copy(in_hbm.at[pl.ds(i * BLK, BLK)], vin, sin)
    cp.start()
    cp.wait()
    vout[...] = vin[...] + jnp.float32(1)
    cp2 = pltpu.make_async_copy(vout, out_hbm.at[pl.ds(i * BLK, BLK)], sout)
    cp2.start()
    cp2.wait()

  def kernel_grid(in_hbm, out_hbm, vin, vout, sin, sout):
    body_sync(pl.program_id(0), in_hbm, out_hbm, vin, vout, sin, sout)

  def kernel_loop(in_hbm, out_hbm, vin, vout, sin, sout):
    lax.fori_loop(
        0, steps,
        lambda i, c: (body_sync(i, in_hbm, out_hbm, vin, vout, sin, sout), c)[1],
        0, unroll=False)

  # double-buffered: step i waits in-slot i%2 (started at i-1), starts
  # in-copy for i+1, computes, then starts out-copy and waits the
  # PREVIOUS out-copy (grid form mirrors the real builder's pipeline).
  def db_start_in(i, slot, in_hbm, vin, sin):
    return pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * BLK, BLK)], vin.at[slot], sin.at[slot])

  def db_out(i, slot, out_hbm, vout, sout):
    return pltpu.make_async_copy(
        vout.at[slot], out_hbm.at[pl.ds(i * BLK, BLK)], sout.at[slot])

  def body_db(i, in_hbm, out_hbm, vin, vout, sin, sout):
    slot = lax.rem(i, 2)
    nxt = 1 - slot

    @pl.when(i + 1 < steps)
    def _():
      db_start_in(i + 1, nxt, in_hbm, vin, sin).start()

    db_start_in(i, slot, in_hbm, vin, sin).wait()
    vout[slot] = vin[slot] + jnp.float32(1)

    @pl.when(i > 0)
    def _():
      db_out(i - 1, nxt, out_hbm, vout, sout).wait()

    db_out(i, slot, out_hbm, vout, sout).start()

    @pl.when(i == steps - 1)
    def _():
      db_out(i, slot, out_hbm, vout, sout).wait()

  def kernel_grid_db(in_hbm, out_hbm, vin, vout, sin, sout):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
      db_start_in(0, 0, in_hbm, vin, sin).start()

    body_db(i, in_hbm, out_hbm, vin, vout, sin, sout)

  def kernel_loop_db(in_hbm, out_hbm, vin, vout, sin, sout):
    db_start_in(0, 0, in_hbm, vin, sin).start()
    lax.fori_loop(
        0, steps,
        lambda i, c: (body_db(i, in_hbm, out_hbm, vin, vout, sin, sout), c)[1],
        0, unroll=False)

  def build(kernel, grid, nbuf):
    shp = ((nbuf, BLK, N, N) if nbuf > 1 else (BLK, N, N))
    sem = (nbuf,) if nbuf > 1 else ()
    hbm = pl.ANY if interpret else pltpu.HBM
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=hbm)],
        out_specs=pl.BlockSpec(memory_space=hbm),
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(shp, jnp.float32),
            pltpu.SemaphoreType.DMA(sem),
            pltpu.SemaphoreType.DMA(sem),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',) * len(grid)),
        interpret=interpret,
    )

  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((N, N, N), dtype=np.float32))

  cases = [
      ('grid sync', kernel_grid, (steps,), 1),
      ('loop sync', kernel_loop, (), 1),
      ('grid db', kernel_grid_db, (steps,), 2),
      ('loop db', kernel_loop_db, (), 2),
  ]
  for tag, kern, grid, nbuf in cases:
    try:
      call = build(kern, grid, nbuf)
      fn = lambda a, call=call: (call(a),)
      want = np.asarray(x) + 1
      got = np.asarray(jax.jit(call)(x))
      ok = np.array_equal(got, want)
      if interpret:
        log('%-10s %s' % (tag, 'OK' if ok else 'WRONG'))
        continue
      dt, cs = slope_time(fn, [x], 0, est)
      frac = bytes_moved / dt / 1e9 / peak
      log('>>> %-10s %.3f ms  roofline=%.3f  per-step %.2f us  %s'
          % (tag, dt * 1e3, frac, dt * 1e6 / steps,
             'OK' if ok else 'WRONG'))
    except Exception as e:  # noqa: BLE001
      log('%-10s FAILED: %s' % (tag, str(e).splitlines()[0][:130]))


if __name__ == '__main__':
  main()
