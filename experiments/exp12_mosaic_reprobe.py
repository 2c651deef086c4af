"""Round-3 experiment 12: re-probe the Mosaic crash catalog + SWAR ops.

CLAUDE.md round-3 outlook: re-probe the crash catalog first (a fixed
native-i16 min alone is ~2x on erosion), then check that every i32
bitwise op needed for packed-SWAR i16x2 evaluation legalizes.

Run ON TPU, selecting groups (crash-prone cases retry for minutes):
  python experiments/exp12_mosaic_reprobe.py swar chain roll widen
  python experiments/exp12_mosaic_reprobe.py native
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def probe(tag, build_kernel, args, want=None):
  """Compile+run one pallas kernel; report PASS / WRONG / FAILED."""
  import jax
  try:
    out = build_kernel(*args)
    out = np.asarray(jax.block_until_ready(out))
    if want is None:
      log('%-44s PASS' % tag)
    elif np.array_equal(out, want):
      log('%-44s PASS (exact)' % tag)
    else:
      log('%-44s WRONG RESULT (max diff %s)' %
          (tag, np.max(np.abs(out.astype(np.int64) - want.astype(np.int64)))))
  except Exception as e:  # noqa: BLE001
    msg = str(e).splitlines()[0][:110] if str(e) else type(e).__name__
    log('%-44s FAILED: %s' % (tag, msg))


def main():
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  groups = set(sys.argv[1:]) or {'native', 'swar', 'chain', 'roll', 'widen'}
  log('device: %s  jax %s  groups %s' %
      (jax.devices()[0], jax.__version__, sorted(groups)))

  rng = np.random.RandomState(0)
  a16 = rng.randint(-3000, 3000, (256, 512), np.int16)
  b16 = rng.randint(-3000, 3000, (256, 512), np.int16)
  a32 = a16.astype(np.int32)
  b32 = b16.astype(np.int32)
  au32 = rng.randint(0, 1 << 16, (256, 512)).astype(np.uint32)
  bu32 = rng.randint(0, 1 << 16, (256, 512)).astype(np.uint32)

  def run1(body, *xs):
    out_dtype = xs[0].dtype

    def kern(*refs):
      *ins, o = refs
      o[...] = body(*[r[...] for r in ins])

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xs[0].shape, out_dtype))(*xs)

  if 'native' in groups:
    # native sub-32-bit arithmetic (historically: min/mul crash Mosaic)
    probe('native i16 min', functools.partial(run1, jnp.minimum), (a16, b16),
          np.minimum(a16, b16))
    probe('native i16 max', functools.partial(run1, jnp.maximum), (a16, b16),
          np.maximum(a16, b16))
    probe('native i16 add', functools.partial(run1, jnp.add), (a16, b16),
          (a16 + b16))
    probe('native i16 mul', functools.partial(run1, jnp.multiply), (a16, b16),
          (a16 * b16))
    u16a = a16.view(np.uint16)
    u16b = b16.view(np.uint16)
    probe('native u16 min', functools.partial(run1, jnp.minimum),
          (u16a, u16b), np.minimum(u16a, u16b))

  if 'swar' in groups:
    # i32 bitwise ops needed for packed-SWAR i16x2 evaluation
    probe('i32 and/or/xor/shifts mix',
          functools.partial(run1, lambda x, y: (
              ((x & 0xFFFF) | (y << 16)) ^ ((x >> 15) & 0x10001))),
          (a32, b32))
    probe('u32 unsigned compare select',
          functools.partial(run1, lambda x, y: jnp.where(x < y, x, y)),
          (au32, bu32), np.minimum(au32, bu32))

    # SWAR i16x2 min: sign-bias both halves, then per-half unsigned min
    # via lane masks (two logical i16 values in [hi half | lo half])
    def swar_min(x, y):
      bias = jnp.int32(-0x80000000 | 0x8000)  # 0x80008000 as i32

      def as_u(v):
        return pltpu.bitcast(v, jnp.uint32)

      xb = as_u(x ^ bias)
      yb = as_u(y ^ bias)
      lo = jnp.minimum(xb & 0xFFFF, yb & 0xFFFF)
      hi = jnp.minimum(xb & jnp.uint32(0xFFFF0000),
                       yb & jnp.uint32(0xFFFF0000))
      return pltpu.bitcast(lo | hi, jnp.int32) ^ bias

    packed_a = (a32 & 0xFFFF) | (b32 << 16)  # a in lo, b in hi
    c16 = rng.randint(-3000, 3000, (256, 512), np.int16)
    d16 = rng.randint(-3000, 3000, (256, 512), np.int16)
    packed_b = (c16.astype(np.int32) & 0xFFFF) | (d16.astype(np.int32) << 16)
    want_lo = np.minimum(a16, c16).astype(np.int32) & 0xFFFF
    want_hi = np.minimum(b16, d16).astype(np.int32) << 16
    probe('SWAR i16x2 min (sign-bias + lane masks)',
          functools.partial(run1, swar_min), (packed_a, packed_b),
          want_lo | want_hi)

    # SWAR add, guard-bit variant for halves proven < 2^14 by ranges
    def swar_add(x, y):
      return pltpu.bitcast(
          (pltpu.bitcast(x, jnp.uint32) & jnp.uint32(0x7FFF7FFF)) +
          (pltpu.bitcast(y, jnp.uint32) & jnp.uint32(0x7FFF7FFF)), jnp.int32)

    small_a = packed_a & 0x0FFF0FFF
    small_b = packed_b & 0x0FFF0FFF
    want = ((small_a & 0x7FFF7FFF).astype(np.uint32) +
            (small_b & 0x7FFF7FFF).astype(np.uint32)).astype(np.int32)
    probe('SWAR i16x2 guarded add', functools.partial(run1, swar_add),
          (small_a, small_b), want)

  if 'chain' in groups:
    # wide arithmetic folds over shifted value slices (exp6 catalog:
    # >12-operand ADD chains die; min chains fine)
    def chain_kernel(n_ops):
      x = rng.randint(0, 100, (256, 512 + 32), np.int32)

      def kern(x_ref, o_ref):
        v = x_ref[:, 0:512]
        for i in range(1, n_ops):
          v = v + x_ref[:, i:512 + i]
        o_ref[...] = v

      return pl.pallas_call(
          kern, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32))(x)

    for n in (8, 13, 16, 24):
      probe('%d-operand shifted add-chain' % n, chain_kernel, (n,))

  if 'roll' in groups:
    # pltpu.roll axis=0 on wide 2-D (exp6 catalog: dies)
    def roll_kernel():
      x = rng.randint(0, 100, (256, 2048), np.int32)

      def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 3, 0)

      return pl.pallas_call(
          kern, out_shape=jax.ShapeDtypeStruct((256, 2048), jnp.int32))(x)

    probe('pltpu.roll axis=0 wide 2-D', roll_kernel, ())

  if 'widen' in groups:
    # i16 storage with i32 compute (the current erosion/xcorr path)
    def widen_kernel():
      def kern(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.minimum(
            x_ref[...].astype(jnp.int32),
            y_ref[...].astype(jnp.int32)).astype(jnp.int16)

      return pl.pallas_call(
          kern, out_shape=jax.ShapeDtypeStruct(a16.shape, jnp.int16))(a16,
                                                                      b16)

    probe('i16 load->i32 compute->i16 store', widen_kernel, (),
          np.minimum(a16, b16))


if __name__ == '__main__':
  main()
