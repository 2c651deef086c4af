"""Round-3 experiment 29: new Mosaic primitives vs the rotate tax.

jax 0.9.0 exposes primitives the crash catalog never probed:
  pack_elementwise / unpack_elementwise  (native i32x2 <-> u32-of-i16)
  pltpu.roll(..., stride=, stride_axis=) (strided rotate)
plus a re-check of i16 vreg DENSITY (exp13 measured i16 stored one
element per 32-bit lane; if a newer Mosaic packs 2/lane, narrow16 mode
and native-i16 chains become live again).

Probes (all (256,1024) i32 blocks, exp24 slope harness, random data):
  ew_i32      10 unshifted i32 min steps  (baseline, exp24: ~1.1/step)
  ew_i16      same chain in native i16 adds (legal ops only): if ~2x
              faster than ew_i32-adds, Mosaic now packs i16 vregs
  roll_i32    10 x (sublane roll d=1..8 + min)   (exp24: ~4.5-5.3)
  roll_pack   same 10 logical steps on HALF the vregs: two (256,512)
              halves packed via pack_elementwise, rotate packed,
              unpack both halves + 2 mins + repack per step
  roll_strided legality probe: pltpu.roll with stride/stride_axis
  pack_cost   pack+unpack+unpack round-trip alone (slots/cell)

Run ON TPU (alone): python experiments/exp29_pack_i16.py
CPU legality: python experiments/exp29_pack_i16.py interpret
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SHAPE = (256, 1024)
HALF = (256, 512)
DISTS = (1, 2, 4, 8, 3, 1, 2, 4, 8, 3)


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


def pallas_loop(body, n, shape=SHAPE, dtype=None):
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl

  dtype = dtype or jnp.int32

  def kern(x_ref, o_ref):
    o_ref[...] = lax.fori_loop(0, n, lambda i, v: body(v), x_ref[...])

  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(shape, dtype),
      interpret=jax.default_backend() != 'tpu')
  return jax.jit(lambda x: call(x))


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  interpret = 'interpret' in sys.argv[1:]
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  cells = SHAPE[0] * SHAPE[1]
  # v5e VPU: 8x128 lanes/cycle @ ~0.94 GHz -> slots/cell conversion
  slot_s = 1.0 / (8 * 128 * 0.94e9)

  rng = np.random.default_rng(0)
  x32 = jnp.asarray(rng.integers(-2**14, 2**14, SHAPE, dtype=np.int32))
  x16 = x32.astype(jnp.int16)

  def report(tag, dt, n_steps):
    log('%-14s %.3g s/iter  %.2f slots/cell/step' %
        (tag, dt, dt / (cells * slot_s) / n_steps))

  def probe(tag, make, x0, n_steps, check=None):
    try:
      if interpret:
        out = np.asarray(make(4)(x0))
        if check is not None:
          ok = check(out, 4)
          log('%-14s interpret %s' % (tag, 'OK' if ok else 'WRONG'))
        else:
          log('%-14s interpret PASS' % tag)
        return
      out = np.asarray(jax.block_until_ready(make(4)(x0)))
      if check is not None and not check(out, 4):
        log('%-14s WRONG RESULT' % tag)
        return
      report(tag, slope(make, x0), n_steps)
    except Exception as e:  # noqa: BLE001
      msg = str(e).splitlines()[0][:110] if str(e) else type(e).__name__
      log('%-14s FAILED: %s' % (tag, msg))

  # --- baselines -----------------------------------------------------
  def ew32_body(v):
    return jnp.minimum(v, v * 3 + 1)

  probe('ew_i32', lambda n: pallas_loop(ew32_body, n), x32, 1)

  def ew16_body(v):
    # i16-legal ops only (exp12: add, bitwise ok; mul/min crash)
    return (v + v) ^ jnp.int16(3)

  def ew32ref_body(v):
    return (v + v) ^ jnp.int32(3)

  probe('ew_i16_addxor',
        lambda n: pallas_loop(ew16_body, n, dtype=jnp.int16), x16, 1)
  probe('ew_i32_addxor', lambda n: pallas_loop(ew32ref_body, n), x32, 1)

  def roll32_body(v):
    for d in DISTS:
      v = jnp.minimum(v, pltpu.roll(v, d, axis=0) if not interpret
                      else jnp.roll(v, d, axis=0))
    return v

  probe('roll10_i32', lambda n: pallas_loop(roll32_body, n), x32,
        len(DISTS))

  # --- packed rotate chain -------------------------------------------
  def packed_body(v):
    # v: u32, halves = two logical i16 columns regions
    for d in DISTS:
      r = pltpu.roll(v, d, axis=0) if not interpret else jnp.roll(
          v, d, axis=0)
      if interpret:
        # emulate unpack/min/pack in numpy-ish jnp for correctness
        a0 = (v & 0xffff).astype(jnp.int32)
        a1 = (v >> 16).astype(jnp.int32)
        b0 = (r & 0xffff).astype(jnp.int32)
        b1 = (r >> 16).astype(jnp.int32)
        m0 = jnp.minimum(a0, b0) & 0xffff
        m1 = jnp.minimum(a1, b1) & 0xffff
        v = (m0 | (m1 << 16)).astype(jnp.uint32)
      else:
        a0 = pltpu.unpack_elementwise(v, index=0, packed_dtype=jnp.int16,
                                      unpacked_dtype=jnp.int32)
        a1 = pltpu.unpack_elementwise(v, index=1, packed_dtype=jnp.int16,
                                      unpacked_dtype=jnp.int32)
        b0 = pltpu.unpack_elementwise(r, index=0, packed_dtype=jnp.int16,
                                      unpacked_dtype=jnp.int32)
        b1 = pltpu.unpack_elementwise(r, index=1, packed_dtype=jnp.int16,
                                      unpacked_dtype=jnp.int32)
        v = pltpu.pack_elementwise(
            [jnp.minimum(a0, b0), jnp.minimum(a1, b1)],
            packed_dtype=jnp.int16)
    return v

  xh = jnp.asarray(
      rng.integers(0, 2**32, HALF, dtype=np.uint64).astype(np.uint32))
  probe('roll10_packed',
        lambda n: pallas_loop(packed_body, n, shape=HALF,
                              dtype=jnp.uint32), xh, len(DISTS))

  # --- pack/unpack round-trip cost -----------------------------------
  def pack_rt(v):
    if interpret:
      return v + jnp.uint32(1)
    a0 = pltpu.unpack_elementwise(v, index=0, packed_dtype=jnp.int16,
                                  unpacked_dtype=jnp.int32)
    a1 = pltpu.unpack_elementwise(v, index=1, packed_dtype=jnp.int16,
                                  unpacked_dtype=jnp.int32)
    return pltpu.pack_elementwise([a0 + 1, a1], packed_dtype=jnp.int16)

  probe('pack_roundtrip',
        lambda n: pallas_loop(pack_rt, n, shape=HALF, dtype=jnp.uint32),
        xh, 1)

  # --- strided roll legality -----------------------------------------
  def strided_body(v):
    if interpret:
      return v + 1
    return pltpu.roll(v, 1, axis=0, stride=1, stride_axis=1) + 1

  probe('roll_strided', lambda n: pallas_loop(strided_body, n), x32, 1)

  # --- native i16 min re-probe (the 2x erosion lever) -----------------
  def min16_body(v):
    return jnp.minimum(v, v + jnp.int16(1))

  probe('min_i16', lambda n: pallas_loop(min16_body, n, dtype=jnp.int16),
        x16, 1)


if __name__ == '__main__':
  main()
