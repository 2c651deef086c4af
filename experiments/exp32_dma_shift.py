"""Round-3 experiment 32: VMEM->VMEM DMA as a shift primitive.

exp24 pinned the chained-stage tax to the in-register cross-vreg
rotate (~4.5-5.3 slots/cell at misaligned sublane distances, ~6-7 at
sub-vreg lane distances) and refuted every *register-side* schedule
shape. The one engine not yet measured is the DMA: a local VMEM->VMEM
copy at a STATIC offset is a legal Mosaic DMA (static sublane offsets
need no 8-alignment; only the slice SHAPE does), runs on the DMA
engines instead of the VPU, and can in principle hide under
independent VPU work.

Questions:
  q1  raw cost: store value -> async copy at offset d -> wait -> min.
      Is (store + DMA grant latency + read-min) ever below the rotate
      cost at the same distance? [dma5_sub_d*, dma5_lane_d*]
  q2  overlap: with TWO independent chains (the multi-subtree CR
      shape), does starting chain A's copy, computing chain B's step,
      then waiting, hide the DMA? [dmaover5_d3]
  q3  fan-out: ONE stored value, FOUR copies in flight at different
      offsets, then a 4-way min fold (the wide-fold shape, e.g.
      erosion's final combine). Do concurrent DMAs pipeline?
      [dmafan4_sub]
Controls: store5 (store+read-min, no DMA) isolates the ref round-trip
tax; rot5_sub_d3 / rot5_lane_d8 are exp24's rotate baselines re-run
in-process (compile-server variance rule).

Semantics under --check: b starts as x; each step copies
a[d:d+CP] -> b[0:CP] (tail rows of b keep their previous content) and
takes v = min(v, b). The NumPy oracle emulates exactly that, so the
check is bit-exact, stale tail included.

Run ON TPU (alone): python experiments/exp32_dma_shift.py
Offline check:      python experiments/exp32_dma_shift.py --check
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SHAPE = (256, 1024)
ROWS_CP = SHAPE[0] - 16  # 8-aligned sublane slice shape, room for d<=16
COLS_CP = SHAPE[1] - 128  # largest lane-tile-aligned lane slice shape
SUB_DISTS = (1, 3, 8)
LANE_DISTS = (1, 8, 128)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def slope(make, x0, n_small=64, n_big=2048, reps=3):
  import jax.numpy as jnp

  fs, fb = make(n_small), make(n_big)

  def timed(f):
    t0 = time.perf_counter()
    out = f(x0)
    _ = jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)).item()
    return time.perf_counter() - t0

  timed(fs)
  timed(fb)
  ts = min(timed(fs) for _ in range(reps))
  tb = min(timed(fb) for _ in range(reps))
  return max((tb - ts) / (n_big - n_small), 1e-12)


def _pallas(kern, n_scratch_slabs, n_sems, interpret):
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  scratch = [pltpu.VMEM(SHAPE, jnp.int32) for _ in range(n_scratch_slabs)]
  scratch += [pltpu.SemaphoreType.DMA for _ in range(n_sems)]
  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
      scratch_shapes=scratch, interpret=interpret)
  return jax.jit(lambda x: call(x))


def make_dma_chain(dists, axis, n, interpret):
  """n iterations of: for d in dists: store v; copy at offset d;
  v = min(v, copy)."""
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def kern(x_ref, o_ref, a_ref, b_ref, sem):
    b_ref[...] = x_ref[...]

    def step(_, v):
      for d in dists:
        a_ref[...] = v
        if axis == 0:
          cp = pltpu.make_async_copy(a_ref.at[pl.ds(d, ROWS_CP), :],
                                     b_ref.at[pl.ds(0, ROWS_CP), :], sem)
        else:
          cp = pltpu.make_async_copy(a_ref.at[:, pl.ds(d, COLS_CP)],
                                     b_ref.at[:, pl.ds(0, COLS_CP)], sem)
        cp.start()
        cp.wait()
        v = jnp.minimum(v, b_ref[...])
      return v

    o_ref[...] = lax.fori_loop(0, n, step, x_ref[...])

  return _pallas(kern, 2, 1, interpret)


def make_store_chain(n_steps, n, interpret):
  """Control: the same store/read-min round-trip with NO dma."""
  import jax.numpy as jnp
  from jax import lax

  def kern(x_ref, o_ref, a_ref):
    def step(_, v):
      for k in range(n_steps):
        a_ref[...] = v ^ k  # xor so steps can't fold
        v = jnp.minimum(v, a_ref[...])
      return v

    o_ref[...] = lax.fori_loop(0, n, step, x_ref[...])

  return _pallas(kern, 1, 0, interpret)


def make_rot_chain(dists, axis, n, interpret):
  """exp24's concat-roll baseline, re-run in-process."""
  import jax.numpy as jnp
  from jax import lax

  def kern(x_ref, o_ref):
    def step(_, v):
      for d in dists:
        if axis == 0:
          v = jnp.minimum(v, jnp.concatenate([v[d:], v[:d]], axis=0))
        else:
          v = jnp.minimum(v, jnp.concatenate([v[:, d:], v[:, :d]],
                                             axis=1))
      return v

    o_ref[...] = lax.fori_loop(0, n, step, x_ref[...])

  import jax
  from jax.experimental import pallas as pl
  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
      interpret=interpret)
  return jax.jit(lambda x: call(x))


def make_overlap_chain(d, n, interpret):
  """Two independent chains: chain A's copy flies while chain B's VPU
  step runs. Output mixes both so neither folds away."""
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def kern(x_ref, o_ref, a_ref, b_ref, sem):
    b_ref[...] = x_ref[...]

    def step(i, vab):
      va, vb = vab
      for _ in range(5):
        a_ref[...] = va
        cp = pltpu.make_async_copy(a_ref.at[pl.ds(d, ROWS_CP), :],
                                   b_ref.at[pl.ds(0, ROWS_CP), :], sem)
        cp.start()
        # independent VPU work (chain B) while the copy flies:
        # one rotate-free stage step (~1 slot, exp24 ew)
        vb = jnp.minimum(vb, vb ^ 0x5A5A)
        vb = vb + (vb >> 3)
        cp.wait()
        va = jnp.minimum(va, b_ref[...])
      return (va, vb)

    va, vb = lax.fori_loop(0, n, step, (x_ref[...], x_ref[...]))
    o_ref[...] = va ^ vb

  return _pallas(kern, 2, 1, interpret)


def make_fan_chain(dists, n, interpret):
  """ONE store, len(dists) copies in flight, then a fold — the wide
  window-fold shape."""
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  k = len(dists)

  def kern(x_ref, o_ref, a_ref, dst_ref, sem):
    dst_ref[...] = jnp.broadcast_to(x_ref[...], (k,) + SHAPE)

    def step(_, v):
      a_ref[...] = v
      cps = [
          pltpu.make_async_copy(a_ref.at[pl.ds(d, ROWS_CP), :],
                                dst_ref.at[j, pl.ds(0, ROWS_CP), :],
                                sem.at[j])
          for j, d in enumerate(dists)
      ]
      for cp in cps:
        cp.start()
      for cp in cps:
        cp.wait()
      for j in range(k):
        v = jnp.minimum(v, dst_ref[j])
      return v

    o_ref[...] = lax.fori_loop(0, n, step, x_ref[...])

  import jax
  scratch = [pltpu.VMEM(SHAPE, jnp.int32),
             pltpu.VMEM((k,) + SHAPE, jnp.int32),
             pltpu.SemaphoreType.DMA((k,))]
  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
      scratch_shapes=scratch, interpret=interpret)
  return jax.jit(lambda x: call(x))


# -- NumPy oracles (stale-tail-exact) -----------------------------------------


def np_dma_chain(x, dists, axis, n):
  v, b = x.copy(), x.copy()
  for _ in range(n):
    for d in dists:
      a = v.copy()
      if axis == 0:
        b[0:ROWS_CP] = a[d:d + ROWS_CP]
      else:
        b[:, 0:COLS_CP] = a[:, d:d + COLS_CP]
      v = np.minimum(v, b)
  return v


def np_fan_chain(x, dists, n):
  v = x.copy()
  dst = np.stack([x.copy() for _ in dists])
  for _ in range(n):
    a = v.copy()
    for j, d in enumerate(dists):
      dst[j, 0:ROWS_CP] = a[d:d + ROWS_CP]
    for j in range(len(dists)):
      v = np.minimum(v, dst[j])
  return v


def np_overlap_chain(x, d, n):
  va, vb, b = x.copy(), x.copy(), x.copy()
  for _ in range(n):
    for _ in range(5):
      a = va.copy()
      vb = np.minimum(vb, vb ^ 0x5A5A)
      vb = vb + (vb >> 3)
      b[0:ROWS_CP] = a[d:d + ROWS_CP]
      va = np.minimum(va, b)
  return va ^ vb


def check():
  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  rng = np.random.RandomState(7)
  x = rng.randint(-30000, 30000, SHAPE).astype(np.int32)
  xj = jnp.asarray(x)
  n = 3
  for d in SUB_DISTS:
    got = np.asarray(make_dma_chain((d,), 0, n, True)(xj))
    assert np.array_equal(got, np_dma_chain(x, (d,), 0, n)), 'sub d=%d' % d
  for d in LANE_DISTS:
    got = np.asarray(make_dma_chain((d,), 1, n, True)(xj))
    assert np.array_equal(got, np_dma_chain(x, (d,), 1, n)), 'lane d=%d' % d
  got = np.asarray(make_fan_chain((1, 3, 6, 9), n, True)(xj))
  assert np.array_equal(got, np_fan_chain(x, (1, 3, 6, 9), n)), 'fan'
  got = np.asarray(make_overlap_chain(3, n, True)(xj))
  assert np.array_equal(got, np_overlap_chain(x, 3, n)), 'overlap'
  log('CHECK OK: dma/fan/overlap chains bit-exact vs stale-tail oracle')


def main():
  if '--check' in sys.argv:
    check()
    return
  import jax
  import jax.numpy as jnp

  log('device: %s' % jax.devices()[0])
  interpret = jax.default_backend() != 'tpu'
  rng = np.random.RandomState(0)
  x0 = jnp.asarray(rng.randint(-30000, 30000, SHAPE, np.int32))
  cells = float(SHAPE[0] * SHAPE[1])

  def run(tag, make, steps):
    try:
      dt = slope(lambda n: make(n), x0)
      slots = 3.9e12 * dt / cells
      log('%-16s: %7.2f us/iter  %6.2f slots/cell  %5.2f slots/step' %
          (tag, dt * 1e6, slots, slots / steps))
    except Exception as e:  # noqa: BLE001
      first = (str(e).splitlines() or [repr(e)])[0]
      log('%-16s: FAILED %s' % (tag, first[:140]))

  run('store5', lambda n: make_store_chain(5, n, interpret), 5)
  run('rot5_sub_d3',
      lambda n: make_rot_chain((3,) * 5, 0, n, interpret), 5)
  run('rot5_lane_d8',
      lambda n: make_rot_chain((8,) * 5, 1, n, interpret), 5)
  for d in SUB_DISTS:
    run('dma5_sub_d%d' % d,
        lambda n, d=d: make_dma_chain((d,) * 5, 0, n, interpret), 5)
  for d in LANE_DISTS:
    run('dma5_lane_d%d' % d,
        lambda n, d=d: make_dma_chain((d,) * 5, 1, n, interpret), 5)
  run('dmaover5_d3', lambda n: make_overlap_chain(3, n, interpret), 5)
  run('dmafan4_sub',
      lambda n: make_fan_chain((1, 3, 6, 9), n, interpret), 4)


if __name__ == '__main__':
  main()
