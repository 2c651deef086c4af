"""Round-2 experiment 1: stage value flow vs VMEM slab round-trips.

Measures the fused-kernel roofline fraction of the four kernels the
round-1 bench put below the 0.8 bar (erosion, seidel2d, jacobi2d,
blur), in both stage modes:

  - vmem: every stage result written to a liveness-reused VMEM slab and
    re-read by consumers (round-1 design).
  - value: stage results stay jnp values; consumers take static slices
    (register shifts) — no per-stage VMEM round trip.

Also probes Mosaic's current int16 ALU coverage (min/add/mul) — the
round-1 blocker that forced 32-bit widening for erosion/blur.

Run ON TPU: python experiments/exp1_value_mode.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def probe_i16_ops():
  """Can Mosaic legalize i16 min / add / mul today?"""
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
      want = nf(x, y)
      ok = np.array_equal(np.asarray(out), want)
      log('i16 %s: %s' % (op_name, 'OK' if ok else 'WRONG RESULT'))
    except Exception as e:  # noqa: BLE001
      log('i16 %s: FAILED %s' % (op_name, str(e).splitlines()[0][:120]))


def probe_sublane_roll():
  """pltpu.roll along the sublane (and 3-D major) axes."""
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  x = np.arange(32 * 256, dtype=np.float32).reshape(32, 256)

  for axis in (0, 1):
    def kernel(a_ref, o_ref, _axis=axis):
      o_ref[:] = pltpu.roll(a_ref[:], 3, axis=_axis)
    try:
      out = pl.pallas_call(
          kernel,
          out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      )(jnp.asarray(x))
      want = np.roll(x, 3, axis=axis)
      ok = np.array_equal(np.asarray(out), want)
      log('roll axis=%d: %s' % (axis, 'OK' if ok else 'WRONG RESULT'))
    except Exception as e:  # noqa: BLE001
      log('roll axis=%d: FAILED %s' % (axis, str(e).splitlines()[0][:120]))


CASES = (
    ('blur', (8192, 2048), {'tile_size': (2048, 0)}),
    ('jacobi2d', (8192, 2048), {'tile_size': (2048, 0)}),
    ('seidel2d', (8192, 2048), {'tile_size': (2048, 0),
                                'optimizations': {'computation-reuse':
                                                  'greedy'}}),
    ('erosion', (8192, 2048), {'tile_size': (2048, 0),
                               'optimizations': {'computation-reuse':
                                                 'greedy'}}),
)


def main():
  import jax
  from bench import bench_kernel, peak_bandwidth

  dev = jax.devices()[0]
  peak = peak_bandwidth(dev)
  log('device: %s peak %.0f GB/s' % (dev, peak))

  probe_i16_ops()
  probe_sublane_roll()

  results = {}
  for name, shape, overrides in CASES:
    for mode in ('value', 'vmem'):
      t0 = time.time()
      try:
        frac, gbps, cps, dt, _ = bench_kernel(
            name, shape, overrides, peak,
            ex_opts={'stage_mode': mode}, compare_xla=False)
        results[(name, mode)] = frac
        log('>>> %s [%s] roofline=%.3f (%.0fs)' %
            (name, mode, frac, time.time() - t0))
      except Exception as e:  # noqa: BLE001
        log('>>> %s [%s] FAILED: %r' % (name, mode, e))

  log('--- summary ---')
  for (name, mode), frac in sorted(results.items()):
    log('%-10s %-6s %.3f' % (name, mode, frac))


if __name__ == '__main__':
  main()
