"""Round-5 experiment 45: isolate the denoise2d/3d transcendental tax.

VERDICT r4 #5: denoise2d records 0.667 against a 1.18 model ceiling and
nobody is obliged to explain the 0.5 gap — round-2 notes ASSERT the
plateau is transcendental cost but never isolated it the way exp24
isolated shifts. This experiment measures, on VMEM-resident f32 blocks
with exp24's chained fori_loop slope method:

  fma10        ten chained x*a+b steps           (the f32 FMA baseline)
  muladd10     ten chained (x+a)*b steps         (non-contractable pair)
  div10        ten chained a/(x+b) steps         (hardware divide)
  recip10      ten chained 1/(x+b) steps         (reciprocal special?)
  sqrt10       ten chained sqrt(x+a) steps
  rsqrt10      ten chained lax.rsqrt(x+a) steps  (the fast_rsqrt path)
  recipsqrt10  ten chained 1/sqrt(x+a) steps     (does Mosaic fuse?)
  gstage       the denoise2d g-stage compound per iteration: 4 rolls,
               4 sub, 4 mul, 4 add, 1 rsqrt — measured vs predicted
               from the unit costs above + exp24's roll prices

Output: slots/cell per step for each (exp24 units: 3.9e12 * dt /
cells), so model/estimate.py's OP_COSTS['div'/'transcendental'] get
measured values and the denoise plateau decomposes into
DMA + shifts + FMA + transcendental with no asserted terms.

Run ON TPU (alone): python experiments/exp45_transcendental_tax.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SHAPE = (256, 1024)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def slope(make, x0, n_small=64, n_big=16384, reps=3):
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


def pallas_loop(body, n):
  """jit(pallas_call) of body applied n times to a (256,1024) f32."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl

  def kern(x_ref, o_ref):
    o_ref[...] = lax.fori_loop(0, n, lambda i, v: body(v), x_ref[...])

  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
      interpret=jax.default_backend() != 'tpu')
  return jax.jit(lambda x: call(x))


# every body maps (0, inf)-ish values back into a bounded positive
# range so a 16k-step chain neither overflows nor denormalizes, and
# each body depends on its input (chained: no ILP across steps, the
# production analog) with data Mosaic cannot fold.

def body_fma10(v):
  for _ in range(10):
    v = v * 0.875 + 0.25
  return v


def body_muladd10(v):
  for _ in range(10):
    v = (v + 0.25) * 0.875
  return v


def body_div10(v):
  for _ in range(10):
    v = 1.75 / (v + 1.5)
  return v


def body_recip10(v):
  for _ in range(10):
    v = 1.0 / (v + 1.5)
  return v


def body_sqrt10(v):
  import jax.numpy as jnp
  for _ in range(10):
    v = jnp.sqrt(v + 0.5)
  return v


def body_rsqrt10(v):
  from jax import lax
  for _ in range(10):
    v = lax.rsqrt(v + 0.5)
  return v


def body_recipsqrt10(v):
  import jax.numpy as jnp
  for _ in range(10):
    v = 1.0 / jnp.sqrt(v + 0.5)
  return v


def body_gstage(v):
  """One denoise2d g-stage per iteration: diffs against 4 rolled
  neighbors, sum of squares, rsqrt (the fast_rsqrt lowering of
  1.0f/sqrt(...), semantics.py:352-358). Rolls use concatenate, the
  shift_mode='roll' production form."""
  import jax.numpy as jnp
  from jax import lax
  up = jnp.concatenate([v[1:], v[:1]], axis=0)
  dn = jnp.concatenate([v[-1:], v[:-1]], axis=0)
  lf = jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)
  rt = jnp.concatenate([v[:, -1:], v[:, :-1]], axis=1)
  du, dd, dl, dr = v - up, v - dn, v - lf, v - rt
  return lax.rsqrt(1.0 + du * du + dd * dd + dl * dl + dr * dr)


def _rolls(v):
  import jax.numpy as jnp
  up = jnp.concatenate([v[1:], v[:1]], axis=0)
  dn = jnp.concatenate([v[-1:], v[:-1]], axis=0)
  lf = jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)
  rt = jnp.concatenate([v[:, -1:], v[:, :-1]], axis=1)
  return up, dn, lf, rt


def body_g_noroll(v):
  """gstage with the 4 rolls removed (diffs against scaled v): the
  gstage-minus-this delta is the pure shift tax at stage ILP."""
  from jax import lax
  du, dd, dl, dr = v - v * 0.5, v - v * 0.25, v - v * 0.75, v - v * 0.125
  return lax.rsqrt(1.0 + du * du + dd * dd + dl * dl + dr * dr)


def body_g_norsqrt(v):
  """gstage with rsqrt replaced by an FMA: the gstage-minus-this delta
  is the pure transcendental tax at stage ILP."""
  up, dn, lf, rt = _rolls(v)
  du, dd, dl, dr = v - up, v - dn, v - lf, v - rt
  s = 1.0 + du * du + dd * dd + dl * dl + dr * dr
  return s * 0.0625 + 0.125


def _full2d(v, g_fn):
  """The COMPLETE denoise2d per-cell update (both inputs = v; the
  f-path costs the same arith), rolls CSE'd the way the production
  value-mode executor does (one roll per distinct (tensor, offset))."""
  import jax.numpy as jnp
  up, dn, lf, rt = _rolls(v)
  du, dd, dl, dr = v - up, v - dn, v - lf, v - rt
  g = g_fn(1.0 + du * du + dd * dd + dl * dl + dr * dr)
  gu, gd, gl, gr = _rolls(g)
  r0 = v * v * 4.9
  r1 = ((r0 * (2.5 + r0 * (10.2 + r0))) *
        (4.3 + r0 * (5.4 + r0 * (6.3 + r0))))
  num = v + 7.7 * (dn * gd + up * gu + rt * gr + lf * gl +
                   5.7 * v * r1)
  den = 11.1 + 7.7 * (gd + gu + gl + gr + 5.7)
  out = num * den
  # keep the chain bounded for 16k steps
  return out * 1e-6 + 0.5


def body_full2d(v):
  from jax import lax
  return _full2d(v, lax.rsqrt)


def body_full2d_norsqrt(v):
  return _full2d(v, lambda s: s * 0.0625 + 0.125)


def body_full2d_noroll(v):
  """full2d with every roll replaced by a scaled copy: the remaining
  cost is the pure-arithmetic floor of the update."""
  import jax.numpy as jnp
  from jax import lax

  def fake_rolls(x):
    return x * 0.5, x * 0.25, x * 0.75, x * 0.125

  up, dn, lf, rt = fake_rolls(v)
  du, dd, dl, dr = v - up, v - dn, v - lf, v - rt
  g = lax.rsqrt(1.0 + du * du + dd * dd + dl * dl + dr * dr)
  gu, gd, gl, gr = fake_rolls(g)
  r0 = v * v * 4.9
  r1 = ((r0 * (2.5 + r0 * (10.2 + r0))) *
        (4.3 + r0 * (5.4 + r0 * (6.3 + r0))))
  num = v + 7.7 * (dn * gd + up * gu + rt * gr + lf * gl +
                   5.7 * v * r1)
  den = 11.1 + 7.7 * (gd + gu + gl + gr + 5.7)
  return (num * den) * 1e-6 + 0.5


def body_full3d(v):
  """denoise3d's per-cell update shape: 6 neighbors (the 2 mid-axis
  ones also lowered as rolls here — the bench kernel's axis-0/mid
  reads are cheaper slab offsets, so this slightly OVERprices), one
  rsqrt, TWO true divides (r1 and the output)."""
  import jax.numpy as jnp
  from jax import lax
  up, dn, lf, rt = _rolls(v)
  io = jnp.concatenate([v[2:], v[:2]], axis=0)
  oi = jnp.concatenate([v[-2:], v[:-2]], axis=0)
  du, dd, dl, dr = v - up, v - dn, v - lf, v - rt
  di, do_ = v - io, v - oi
  g = lax.rsqrt(0.00005 + du * du + dd * dd + dl * dl + dr * dr +
                di * di + do_ * do_)
  gu, gd, gl, gr = _rolls(g)
  gi = jnp.concatenate([g[2:], g[:2]], axis=0)
  go = jnp.concatenate([g[-2:], g[:-2]], axis=0)
  r0 = v * v * (1.0 / 0.03)
  r1 = ((r0 * (2.38944 + r0 * (0.950037 + r0))) /
        (4.65314 + r0 * (2.57541 + r0 * (1.48937 + r0))))
  num = v + 5.0 * (dn * gd + up * gu + rt * gr + lf * gl +
                   io * gi + oi * go + (1.0 / 0.03) * v * r1)
  den = 1.0 + 5.0 * (gd + gu + gl + gr + gi + go + (1.0 / 0.03))
  return (num / den) * 1e-6 + 0.5


def main():
  import jax
  import jax.numpy as jnp

  log('device: %s' % jax.devices()[0])
  rng = np.random.RandomState(0)
  x0 = jnp.asarray(rng.uniform(0.1, 2.0, SHAPE).astype(np.float32))
  cells = float(SHAPE[0] * SHAPE[1])

  def run(tag, body, steps):
    try:
      dt = slope(lambda n: pallas_loop(body, n), x0)
      slots = 3.9e12 * dt / cells
      log('%-12s: %7.1f us/iter  %6.2f slots/cell  %5.2f slots/step' %
          (tag, dt * 1e6, slots, slots / steps))
      return slots / steps
    except Exception as e:  # noqa: BLE001
      first = (str(e).splitlines() or [repr(e)])[0]
      log('%-12s: FAILED %s' % (tag, first[:140]))
      return None

  if '--decompose' not in sys.argv:
    fma = run('fma10', body_fma10, 10)
    run('muladd10', body_muladd10, 10)
    div = run('div10', body_div10, 10)
    run('recip10', body_recip10, 10)
    run('sqrt10', body_sqrt10, 10)
    rsq = run('rsqrt10', body_rsqrt10, 10)
    run('recipsqrt10', body_recipsqrt10, 10)
    g = run('gstage', body_gstage, 1)
    if None not in (fma, div, rsq, g):
      # predicted gstage: 4 rolls (2 sublane d1 ~4.5-5.3 + 2 lane d1
      # ~6-7 per exp24) + 4 sub + 4 mul + 4 add (FMA-contractable to
      # ~8 slots at the fma rate) + 1 rsqrt
      pred = 2 * 4.9 + 2 * 6.5 + 12 * fma + rsq
      log('gstage predicted %.1f vs measured %.1f slots/cell'
          % (pred, g))
    return

  # --decompose: the denoise plateau split into shift / transcendental
  # / arithmetic-floor terms at real stage-level ILP
  g = run('gstage', body_gstage, 1)
  gnr = run('g_noroll', body_g_noroll, 1)
  gns = run('g_norsqrt', body_g_norsqrt, 1)
  f2 = run('full2d', body_full2d, 1)
  f2ns = run('full2d_norsqrt', body_full2d_norsqrt, 1)
  f2nr = run('full2d_noroll', body_full2d_noroll, 1)
  f3 = run('full3d', body_full3d, 1)
  if None not in (g, gnr, gns, f2, f2ns, f2nr):
    log('g-stage: shift tax %.1f, rsqrt tax %.1f of %.1f total'
        % (g - gnr, g - gns, g))
    log('full2d: shift tax %.1f, rsqrt tax %.1f, arith floor %.1f '
        'of %.1f total' % (f2 - f2nr, f2 - f2ns, f2nr, f2))
  if f2 is not None:
    cells2d = 8192.0 * 2048.0
    # bench denoise2d: 3 f32 arrays of HBM traffic
    dma_ms = 3 * cells2d * 4 / 819e9 * 1e3
    comp_ms = f2 * cells2d / 3.9e12 * 1e3
    log('denoise2d bound: DMA %.3f ms vs synthetic compute %.3f ms '
        '-> best achievable frac %.3f (record 0.667)'
        % (dma_ms, comp_ms, dma_ms / max(dma_ms, comp_ms)))
  if f3 is not None:
    cells3d = 2048.0 * 32 * 128
    dma_ms = 3 * cells3d * 4 / 819e9 * 1e3
    comp_ms = f3 * cells3d / 3.9e12 * 1e3
    log('denoise3d bound: DMA %.3f ms vs synthetic compute %.3f ms '
        '-> best achievable frac %.3f (record 0.737 in-process)'
        % (dma_ms, comp_ms, dma_ms / max(dma_ms, comp_ms)))


if __name__ == '__main__':
  main()
