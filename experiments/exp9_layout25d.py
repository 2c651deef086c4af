"""Round-2 experiment 9: 2.5-D layout prototype for 2-D stencils.

Hypothesis: reshaping a 2-D grid (H, W) as (H, W/128, 128) makes
streaming-axis shifts FREE (axis 0 of a 3-D array is a plane stride,
not the sublane axis) at the cost of a chunk-boundary fix-up for lane
shifts (roll + mid-shifted roll + lane-position select). heat3d's 0.99
vs jacobi2d's 0.63 at similar op intensity is the evidence.

Hand-written 2-sweep jacobi2d in both layouts, same DMA structure as
the production executor (via PallasExecutor for 2-D; a bespoke kernel
for 2.5-D).

Run ON TPU: python experiments/exp9_layout25d.py
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def build_25d(h, n_chunks, block):
  """2-sweep jacobi over (h, n_chunks, 128) f32, halo 2 rows."""
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  LO = HI = 2  # two fused sweeps, 1-cell halo each
  s = block + LO + HI
  lanes = 128

  def sweep(v):
    lane_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    # v: (rows, n_chunks, 128). north/south: free axis-0 slices on a
    # value; east/west: lane rotate + chunk-boundary fix via
    # mid-rolled rotate selected at the edge lane. (pltpu.roll wants
    # non-negative shifts: use the modular complement.)
    rows = v.shape[0]
    c = v[1:rows - 1]
    n = v[0:rows - 2]
    so = v[2:rows]
    vm_prev = pltpu.roll(c, 1, axis=1)                # chunk j-1
    vm_next = pltpu.roll(c, n_chunks - 1, axis=1)     # chunk j+1
    e = jnp.where(lane_pos == lanes - 1,
                  pltpu.roll(vm_next, lanes - 1, axis=2),
                  pltpu.roll(c, lanes - 1, axis=2))
    w = jnp.where(lane_pos == 0,
                  pltpu.roll(vm_prev, 1, axis=2),
                  pltpu.roll(c, 1, axis=2))
    return (c + n + so + e + w) * np.float32(0.2)

  def kernel(x_hbm, o_ref, slab, sem):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    def start(p):
      return jnp.clip(p * block - LO, 0, h - s)

    def copy(p, slot):
      return pltpu.make_async_copy(
          x_hbm.at[pl.ds(start(p), s)], slab.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
      copy(i, 0).start()

    @pl.when(i + 1 < n_i)
    def _():
      copy(i + 1, (i + 1) % 2).start()

    copy(i, i % 2).wait()
    v = slab[i % 2]
    t = sweep(sweep(v))  # (s-4, ...) valid rows [2, s-2)

    def sstart(p):  # static (Python-int) slab base per block class
      return min(max(p * block - LO, 0), h - s)

    n_blocks = h // block
    base_first = 0 - sstart(0)
    base_mid = block - sstart(1) if n_blocks > 1 else 0
    base_tail = (n_blocks - 1) * block - sstart(n_blocks - 1)

    def store(base):
      jlo = max(0, 2 - base)
      jhi = min(block, (s - 2) - base)
      o_ref[jlo:jhi] = t[base - 2 + jlo:base - 2 + jhi]

    @pl.when(i == 0)
    def _():
      store(base_first)

    @pl.when(jnp.logical_and(i > 0, i < n_i - 1))
    def _():
      store(base_mid)

    @pl.when(i == n_i - 1)
    def _():
      store(base_tail)

  call = pl.pallas_call(
      kernel,
      grid=(h // block,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
      out_specs=pl.BlockSpec((block, n_chunks, lanes),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((h, n_chunks, lanes), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((2, s, n_chunks, lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
  )
  return jax.jit(lambda x: call(x))


def main():
  import jax
  import jax.numpy as jnp
  from bench import peak_bandwidth
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import slope_time

  peak = peak_bandwidth(jax.devices()[0])
  h, w = 8192, 2048
  n_chunks = w // 128

  # correctness vs the oracle (small)
  small_h = 64
  x_small = np.random.default_rng(0).standard_normal(
      (small_h, 16, 128)).astype(np.float32)
  fn_small = build_25d(small_h, 16, 32)
  got = np.asarray(fn_small(jnp.asarray(x_small)))
  x2 = x_small.reshape(small_h, 16 * 128)
  st = corpus.build('jacobi2d', tile_size=(16 * 128, 0))
  want = reference.run(st, {'t1': x2})['t0']
  region = (slice(2, small_h - 2), slice(2, 16 * 128 - 2))
  err = np.max(np.abs(got.reshape(small_h, -1)[region] - want[region]))
  log('2.5-D correctness: max abs err %.3g %s' %
      (err, 'OK' if err < 1e-4 else 'FAIL'))

  for block in (256, 512, 1024):
    try:
      fn = build_25d(h, n_chunks, block)
      x = jnp.zeros((h, n_chunks, 128), jnp.float32)
      dt, cs = slope_time(lambda a: (fn(a),), [x], 0,
                          h * w * 8 / (peak * 1e9))
      frac = h * w * 8 / dt / 1e9 / peak
      log('2.5-D block=%-5d %.3f ms roofline=%.3f (compile %.0fs)' %
          (block, dt * 1e3, frac, cs))
    except Exception as e:  # noqa: BLE001
      log('2.5-D block=%d FAILED: %s' %
          (block, str(e).splitlines()[0][:130]))

  # production 2-D executor at its best-known config, for comparison
  st = corpus.build('jacobi2d', tile_size=(2048, 0))
  for blk in (256, 512):
    try:
      ex = PallasExecutor(st, (h, w), block_rows=blk)
      inputs = reference.make_test_inputs(st, (h, w))
      args = list(ex.prepare(inputs))
      dt, _ = slope_time(ex.fn, args, 0, h * w * 8 / (peak * 1e9))
      frac = h * w * 8 / dt / 1e9 / peak
      log('2-D    block=%-5d %.3f ms roofline=%.3f' %
          (blk, dt * 1e3, frac))
    except Exception as e:  # noqa: BLE001
      log('2-D block=%d FAILED: %s' % (blk, str(e).splitlines()[0][:130]))


if __name__ == '__main__':
  main()
