"""Round-3 experiment 13: native-i16 stage evaluation feasibility.

exp12 found native i16 ADD legalizes (min/mul still crash). erosion's
min chains cannot overflow at i16 (min's range is its inputs' range)
and xcorr's sums are ring ops (wrap sinking proves storage-width
evaluation exact) — so if a cmp+select min legalizes at i16, both
kernels can run narrow at 2x lane density.

Groups: legal (op probes), time (chain slope i16 vs i32).
Run ON TPU: python experiments/exp13_narrow_i16.py [legal|time ...]
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def probe(tag, fn, want=None):
  import jax
  try:
    out = np.asarray(jax.block_until_ready(fn()))
    if want is None:
      log('%-44s PASS' % tag)
    elif np.array_equal(out, want):
      log('%-44s PASS (exact)' % tag)
    else:
      log('%-44s WRONG (maxdiff %s)' % (
          tag, np.max(np.abs(out.astype(np.int64) - want.astype(np.int64)))))
  except Exception as e:  # noqa: BLE001
    msg = str(e).splitlines()[0][:100] if str(e) else type(e).__name__
    log('%-44s FAILED: %s' % (tag, msg))


def legal_probes():
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl

  rng = np.random.RandomState(0)
  a = rng.randint(-3000, 3000, (256, 512), np.int16)
  b = rng.randint(-3000, 3000, (256, 512), np.int16)

  def run(body, *xs, out_dtype=np.int16, out_shape=None):
    def kern(*refs):
      *ins, o = refs
      o[...] = body(*[r for r in ins])

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape or xs[0].shape,
                                       out_dtype))(*xs)

  cases = [
      ('i16 where(a<b,a,b) [cmp+select min]',
       lambda x, y: jnp.where(x[...] < y[...], x[...], y[...]),
       np.minimum(a, b)),
      ('i16 sub', lambda x, y: x[...] - y[...], (a - b)),
      ('i16 synth-sub a+(b^-1)+1',
       lambda x, y: x[...] + (y[...] ^ jnp.int16(-1)) + jnp.int16(1),
       (a - b)),
      ('i16 and/or/xor',
       lambda x, y: (x[...] & y[...]) | (x[...] ^ y[...]), None),
      ('i16 shl/shr const',
       lambda x, y: (x[...] << 2) + (y[...] >> 3),
       (a << 2) + (b >> 3)),
      ('i16 mask-min b+((a-b)&-(a<b))',
       lambda x, y: y[...] + ((x[...] - y[...]) &
                              (-(x[...] < y[...]).astype(jnp.int16))),
       np.minimum(a, b)),
      ('i16 compare only (to bool->i16 add)',
       lambda x, y: (x[...] < y[...]).astype(jnp.int16) + jnp.int16(0),
       (a < b).astype(np.int16)),
  ]
  for tag, body, want in cases:
    probe(tag, functools.partial(run, body, a, b), want)

  # shifted-slice loads at i16 (odd lane offset; sublane offset)
  wide = rng.randint(-3000, 3000, (256, 512 + 32), np.int16)

  def lane_shift(x):
    return x[:, 0:512] + x[:, 3:515]

  probe('i16 lane-shifted slice add (off 3)',
        functools.partial(run, lane_shift, wide,
                          out_shape=(256, 512)),
        wide[:, 0:512] + wide[:, 3:515])

  tall = rng.randint(-3000, 3000, (256 + 32, 512), np.int16)

  def sub_shift(x):
    return x[0:256, :] + x[5:261, :]

  probe('i16 sublane-shifted slice add (off 5)',
        functools.partial(run, sub_shift, tall, out_shape=(256, 512)),
        tall[0:256, :] + tall[5:261, :])

  # 19-tap folds at i16 (the xcorr/erosion stage shapes)
  def fold_add(x):
    v = x[:, 0:512]
    for i in range(1, 19):
      v = v + x[:, i:512 + i]
    return v

  want = wide[:, 0:512].copy()
  for i in range(1, 19):
    want = want + wide[:, i:512 + i]
  probe('i16 19-tap lane add fold', functools.partial(
      run, fold_add, wide, out_shape=(256, 512)), want)

  def fold_min(x):
    v = x[:, 0:512]
    for i in range(1, 19):
      s = x[:, i:512 + i]
      v = jnp.where(s < v, s, v)
    return v

  want = wide[:, 0:512].copy()
  for i in range(1, 19):
    want = np.minimum(want, wide[:, i:512 + i])
  probe('i16 19-tap lane where-min fold', functools.partial(
      run, fold_min, wide, out_shape=(256, 512)), want)

  def fold_min_sub(x):
    v = x[0:256, :]
    for i in range(1, 19):
      s = x[i:256 + i, :]
      v = jnp.where(s < v, s, v)
    return v

  want = tall[0:256, :].copy()
  for i in range(1, 19):
    want = np.minimum(want, tall[i:256 + i, :])
  probe('i16 19-tap sublane where-min fold', functools.partial(
      run, fold_min_sub, tall, out_shape=(256, 512)), want)


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


def chain_time(kind, dtype, shape=(512, 2048)):
  """ps per chained elem-op: shifted-load + combine chains."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def step(acc):
    shifted = jnp.concatenate([acc[:, 1:], acc[:, :1]], axis=1) \
        if 'lane' in kind else jnp.concatenate([acc[1:], acc[:1]], axis=0)
    if 'swar' in kind:
      # packed i16x2-in-i32: funnel-shift one LOGICAL element across
      # halves, then per-half signed min via shift-to-top compares.
      # Measures the per-element cost of the SWAR route for erosion.
      nxt = shifted
      elem = ((acc >> 16) & 0xFFFF) | (nxt << 16)
      m = jnp.int32(-65536)  # 0xFFFF0000
      lo = jnp.where((elem << 16) < (acc << 16), elem, acc) & 0xFFFF
      hi = jnp.where((elem & m) < (acc & m), elem, acc) & m
      return lo | hi
    if 'min' in kind:
      return jnp.where(shifted < acc, shifted, acc)
    if 'nmin' in kind:
      return jnp.minimum(shifted, acc)
    return acc + shifted

  def make(n_ops):
    def kernel(x_ref, o_ref):
      acc = x_ref[...]
      acc = lax.fori_loop(0, n_ops, lambda i, a: step(a), acc)
      o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda x: call(x))

  x0 = jnp.zeros(shape, dtype)
  n_small, n_big = 32, 512
  dt = slope(make(n_small), make(n_big), n_small, n_big, x0)
  elems = float(np.prod(shape)) * (2 if 'swar' in kind else 1)
  log('%-28s %-7s %s: %6.2f ps/elem-op (%.3g elem-ops/s)' %
      (kind, dtype, shape, dt / elems * 1e12, elems / dt))
  return dt / elems


def main():
  import jax
  groups = set(sys.argv[1:]) or {'legal', 'time'}
  log('device: %s  groups %s' % (jax.devices()[0], sorted(groups)))
  if 'legal' in groups:
    legal_probes()
  if 'time' in groups:
    for kind in ('lane_min', 'lane_add', 'sub_min', 'sub_add'):
      for dtype in ('int32', 'int16'):
        try:
          chain_time(kind, dtype)
        except Exception as e:  # noqa: BLE001
          log('%-28s %-7s FAILED: %s' %
              (kind, dtype, str(e).splitlines()[0][:90]))
    # nmin = native jnp.minimum baseline; swar at half lanes/elem
    for kind, dtype, shape in (('lane_nmin', 'int32', (512, 2048)),
                               ('lane_swar_pk', 'int32', (512, 1024))):
      try:
        chain_time(kind, dtype, shape)
      except Exception as e:  # noqa: BLE001
        log('%-28s %-7s FAILED: %s' %
            (kind, dtype, str(e).splitlines()[0][:90]))


if __name__ == '__main__':
  main()
