"""Round-3 experiment 16: packed-SWAR i16x2 min vs widened i32 min.

VERDICT item 1 asks for packed-SWAR erosion or a measured refutation.
Mosaic legalizes no i16 compare/min (exp12/13), so SWAR must build a
per-half min from i32 bitwise ops. Op count per packed pair (2
elements): two shift-to-top signed compares + selects + masks ~= 11
i32 ops, vs the wide path's 1-op full-width min. This experiment measures the two-stage erosion compute shape
(19-tap sublane chain + 19-tap lane chain, CR-style doubling) both
ways on VMEM-resident data.

Run ON TPU (alone): python experiments/exp16_swar_erosion.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


# CR-style doubling chain covering an 18-element span: distances
# between combine steps (span accumulates 1+2+4+8+3 = 18)
DISTS = (1, 2, 4, 8, 3)


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
  log('    abs: t(%d)=%.3f ms t(%d)=%.3f ms' %
      (n_small, ts * 1e3, n_big, tb * 1e3))
  return max((tb - ts) / (n_big - n_small), 1e-12)


def wide_kernel(shape=(512, 2048)):
  """i16 storage, i32 compute (the current erosion path)."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl

  def two_stage(v):
    # stage 1: sublane-axis min chain
    for d in DISTS:
      shifted = jnp.concatenate([v[d:], v[:d]], axis=0)
      v = jnp.minimum(v, shifted)
    # stage 2: lane-axis min chain
    for d in DISTS:
      shifted = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
      v = jnp.minimum(v, shifted)
    return v

  def make(n):
    def kern(x_ref, o_ref):
      v = x_ref[...].astype(jnp.int32)
      v = lax.fori_loop(0, n, lambda i, a: two_stage(a), v)
      o_ref[...] = v.astype(jnp.int16)

    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.int16),
        interpret=jax.default_backend() != 'tpu')
    return jax.jit(lambda x: call(x))

  return make


def swar_kernel(shape=(512, 1024)):
  """i16x2 packed in i32 lanes; per-half min via masked compares."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl

  def swar_min(x, y):
    # per-half signed min via shift-to-top compares (numpy-verified
    # exact): the low half compares as (v << 16) signed, the high half
    # as (v & 0xFFFF0000) signed. ~11 i32 ops per packed pair.
    m = jnp.int32(-65536)
    lo = jnp.where((x << 16) < (y << 16), x, y) & jnp.int32(0xFFFF)
    hi = jnp.where((x & m) < (y & m), x, y) & m
    return lo | hi

  def elem_shift(v, d, lanes):
    """Shift by d LOGICAL elements along the packed lane axis."""
    k, odd = divmod(d, 2)
    if k:
      v0 = jnp.concatenate([v[:, k:], v[:, :k]], axis=1)
    else:
      v0 = v
    if not odd:
      return v0
    nxt = jnp.concatenate([v0[:, 1:], v0[:, :1]], axis=1)
    lo = (v0 >> 16) & jnp.int32(0xFFFF)
    return lo | (nxt << 16)

  def two_stage(v):
    for d in DISTS:  # sublane axis: packing is lane-wise, no funnel
      shifted = jnp.concatenate([v[d:], v[:d]], axis=0)
      v = swar_min(v, shifted)
    for d in DISTS:  # lane axis: logical-element shifts
      v = swar_min(v, elem_shift(v, d, shape[1]))
    return v

  def make(n):
    def kern(x_ref, o_ref):
      v = lax.fori_loop(0, n, lambda i, a: two_stage(a), x_ref[...])
      o_ref[...] = v

    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        interpret=jax.default_backend() != 'tpu')
    return jax.jit(lambda x: call(x))

  return make


def main():
  import jax
  import jax.numpy as jnp

  log('device: %s' % jax.devices()[0])
  rng = np.random.RandomState(0)
  raw = rng.randint(-3000, 3000, (512, 2048), np.int16)

  # correctness: one application must agree element-wise
  wide = wide_kernel()
  swar = swar_kernel()
  w1 = np.asarray(wide(1)(jnp.asarray(raw)))
  s1 = np.asarray(swar(1)(jnp.asarray(raw.view(np.int32))))
  s1 = s1.view(np.int16)
  if np.array_equal(w1, s1):
    log('correctness: SWAR == wide (exact)')
  else:
    log('correctness: MISMATCH (%d cells)' % int((w1 != s1).sum()))

  cells = 512.0 * 2048.0
  dt_w = slope(wide, jnp.asarray(raw))
  log('wide  i32: %8.1f us/iter  %5.2f ps/cell/two-stage' %
      (dt_w * 1e6, dt_w / cells * 1e12))
  dt_s = slope(swar, jnp.asarray(raw.view(np.int32)))
  log('swar i16x2: %8.1f us/iter  %5.2f ps/cell/two-stage' %
      (dt_s * 1e6, dt_s / cells * 1e12))
  log('swar/wide time ratio: %.2f (>1 refutes SWAR)' % (dt_s / dt_w))


if __name__ == '__main__':
  main()
