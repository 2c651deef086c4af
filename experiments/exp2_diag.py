"""Round-2 experiment 2: where do the 2-D kernels lose their time?

heat3d (3-D layout) reaches 0.98 of HBM roofline at ~18 vector ops per
cell, while jacobi2d/seidel2d (same op intensity, 2-D layout) stall at
~0.65. Suspects:

  a. sublane-direction shifts on wide 2-D slabs cost more than the
     3-D layout's free major-axis shifts;
  b. wide-lane (2048) funnel shifts vs 128-lane rotates;
  c. i16 stages (erosion) pay conversion churn: wrap to i16 at every
     stage boundary, re-widen at every consume, widen again per roll.

Measures:
  1. VPU throughput: dependent-FMA chain slope (ops/s).
  2. shifted-add chains: sublane shift, lane roll, free-axis shift.
  3. DMA-only ceiling of the executor harness (copy kernel).
  4. Mosaic i16 min/add/mul legalization probe (repeat of exp1's).

Run ON TPU: python experiments/exp2_diag.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def slope(f_small, f_big, n_small, n_big, x0, reps=3):
  import jax.numpy as jnp

  def timed(f):
    t0 = time.perf_counter()
    out = f(x0)
    _ = jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)).item()
    return time.perf_counter() - t0

  timed(f_small)
  timed(f_big)
  ts = min(timed(f_small) for _ in range(reps))
  tb = min(timed(f_big) for _ in range(reps))
  return max((tb - ts) / (n_big - n_small), 1e-12)


def vpu_chain(kind: str, shape=(512, 2048), dtype='float32'):
  """Time per chained op over a VMEM-resident block.

  kind: fma | add | sublane_shift_add | lane_roll_add | major_shift_add
  Returns seconds per (op applied to `shape` elements).
  """
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def step(acc):
    if kind == 'fma':
      return acc * np.array(1.0000001, dtype) + np.array(1e-9, dtype)
    if kind == 'add':
      return acc + acc
    if kind == 'sublane_shift_add':
      # static misaligned slice along the second-to-minor axis
      return acc + jnp.concatenate(
          [acc[1:], acc[:1]], axis=0)
    if kind == 'sublane_roll_add':
      return acc + pltpu.roll(acc, 1, axis=0)
    if kind == 'lane_roll_add':
      return acc + pltpu.roll(acc, 1, axis=len(shape) - 1)
    if kind == 'major_shift_add':
      return acc + jnp.concatenate([acc[1:], acc[:1]], axis=0)
    raise ValueError(kind)

  def make(n_ops):
    def kernel(x_ref, o_ref):
      acc = x_ref[:]
      acc = lax.fori_loop(0, n_ops, lambda i, a: step(a), acc)
      o_ref[:] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda x: call(x))

  x0 = jnp.zeros(shape, dtype)
  n_small, n_big = 32, 512
  f_small, f_big = make(n_small), make(n_big)
  dt = slope(f_small, f_big, n_small, n_big, x0)
  cells = float(np.prod(shape))
  log('%-22s %-8s %s: %.2f ps/elem-op  (%.3g elem-ops/s)' %
      (kind, dtype, shape, dt / cells * 1e12, cells / dt))
  return dt / cells


def dma_ceiling(shape=(8192, 2048), dtype='float32'):
  """Copy kernel with the executor's DMA structure: roofline ceiling."""
  import jax
  from bench import peak_bandwidth, slope_time
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor

  ctype = {'float32': 'float', 'uint16': 'uint16'}[dtype]
  src = ('kernel: copycat\nburst width: 64\nunroll factor: 1\n'
         'iterate: 1\nborder: ignore\ncluster: none\n'
         'input dram 0 %s: a(%d, *)\n'
         'output dram 1 %s: b(0, 0) = a(0, 0)\n'
         % (ctype, shape[-1], ctype))
  stencil = api.build_stencil(src)
  peak = peak_bandwidth(jax.devices()[0])
  ex = PallasExecutor(stencil, shape, block_rows=512)
  inputs = reference.make_test_inputs(stencil, shape)
  args = list(ex.prepare(inputs))
  bytes_per = 2 * float(np.prod(shape)) * np.dtype(dtype).itemsize
  dt, _ = slope_time(ex.fn, args, 0, bytes_per / (peak * 1e9))
  log('copy %s %s: %.3f ms  %.1f GB/s  (%.1f%% of %.0f)' %
      (dtype, shape, dt * 1e3, bytes_per / dt / 1e9,
       100 * bytes_per / dt / 1e9 / peak, peak))


def probe_i16_ops():
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  rng = np.random.default_rng(0)
  x = rng.integers(-30000, 30000, (32, 256), dtype=np.int16)
  y = rng.integers(-30000, 30000, (32, 256), dtype=np.int16)
  for op_name, jf, nf in (
      ('min', jnp.minimum, np.minimum),
      ('add', lambda a, b: a + b, lambda a, b: a + b),
      ('mul', lambda a, b: a * b, lambda a, b: a * b),
  ):
    def kernel(a_ref, b_ref, o_ref, _jf=jf):
      o_ref[:] = _jf(a_ref[:], b_ref[:])
    try:
      out = pl.pallas_call(
          kernel,
          out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      )(jnp.asarray(x), jnp.asarray(y))
      ok = np.array_equal(np.asarray(out), nf(x, y))
      log('i16 %s: %s' % (op_name, 'OK' if ok else 'WRONG RESULT'))
    except Exception as e:  # noqa: BLE001
      log('i16 %s: FAILED %s' % (op_name, str(e).splitlines()[0][:150]))


def main():
  import jax
  log('device: %s' % (jax.devices()[0],))
  probe_i16_ops()

  cases = [
      ('fma', {}, dict(dtype='float32')),
      ('add', {}, dict(dtype='int32')),
      ('add', {}, dict(dtype='int16')),
      ('sublane_shift_add', {}, dict(dtype='float32')),
      ('sublane_roll_add', {}, dict(dtype='float32')),
      ('lane_roll_add', {}, dict(dtype='float32')),
      # 3-D layout: major-axis shift should be near-free
      ('major_shift_add', {}, dict(shape=(128, 32, 128),
                                   dtype='float32')),
      ('lane_roll_add', {}, dict(shape=(128, 32, 128), dtype='float32')),
  ]
  for kind, _, kw in cases:
    try:
      vpu_chain(kind, **kw)
    except Exception as e:  # noqa: BLE001
      log('%-22s %s FAILED: %s' % (kind, kw, str(e).splitlines()[0][:150]))

  for dtype in ('float32', 'uint16'):
    try:
      dma_ceiling(dtype=dtype)
    except Exception as e:  # noqa: BLE001
      log('copy %s FAILED: %s' % (dtype, str(e).splitlines()[0][:150]))


if __name__ == '__main__':
  main()
