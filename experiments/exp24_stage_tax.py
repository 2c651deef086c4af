"""Round-3 experiment 24: decompose the ~7-slot chained-stage tax.

Theory under test: the per-chained-stage cost in value/roll mode is
VMEM round-trip bound (~2.4 slots per 4-byte touch/cell), because
Mosaic materializes every full-block stage value to VMEM and does not
fuse across shifted (or even unshifted?) ops. exp11's numbers fit:
  flat 8-tap fold  = 9 touches (8 reads + 1 store) -> 2.6 slots/tap
  chained stage    = 3 touches (2 reads + 1 store) -> ~7 slots/stage

If true, evaluating the whole stage chain CHUNK-WISE (small row tiles
whose intermediates fit in vector registers) should approach the
2-3 touches/cell floor regardless of chain length.

Variants (all: (512, 2048) i32 VMEM-resident block, fori_loop chained,
10 chain steps per iteration, random data so Mosaic can't fold):
  ew10      ten UNshifted min steps vs a second block (does Mosaic fuse
            plain elementwise chains? if yes, rolls are what break it)
  roll10    ten concat-roll+min steps (exp16 shape; production analog)
  chunkK    same 10-step rolled chain evaluated per K-row chunk with
            static shrinking value slices (K in 8/32/128)
  chunkKxW  chunked in both dims (lane tiles of W) if full-row chunks
            still spill

Run ON TPU (alone): python experiments/exp24_stage_tax.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SHAPE = (256, 1024)
# sublane-axis distances of a CR doubling chain covering span 18, then
# the same along lanes: 10 chained (shift + min) steps total.
DISTS0 = (1, 2, 4, 8, 3)
DISTS1 = (1, 2, 4, 8, 3)
MARGIN0 = sum(DISTS0)  # rows of upper margin a chunk needs


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
  """jit(pallas_call) of body applied n times to a (512,2048) i32."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from jax.experimental import pallas as pl

  def kern(x_ref, o_ref):
    o_ref[...] = lax.fori_loop(0, n, lambda i, v: body(v), x_ref[...])

  call = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
      interpret=jax.default_backend() != 'tpu')
  return jax.jit(lambda x: call(x))


def body_ew10(v):
  """Ten unshifted chained steps (min keeps values bounded)."""
  import jax.numpy as jnp
  for k in range(10):
    v = jnp.minimum(v + 1, v[::-1] if False else v) + (k & 1)
  return v


def body_ew10_real(v):
  """Ten unshifted chained min/xor steps that can't fold away."""
  import jax.numpy as jnp
  for k in range(5):
    v = jnp.minimum(v, v ^ (0x5A5A + k))
    v = v + (v >> 3)
  return v


def body_roll10(v):
  import jax.numpy as jnp
  for d in DISTS0:
    v = jnp.minimum(v, jnp.concatenate([v[d:], v[:d]], axis=0))
  for d in DISTS1:
    v = jnp.minimum(v, jnp.concatenate([v[:, d:], v[:, :d]], axis=1))
  return v


def body_roll5_sub(v):
  import jax.numpy as jnp
  for d in DISTS0:
    v = jnp.minimum(v, jnp.concatenate([v[d:], v[:d]], axis=0))
  return v


def body_roll5_lane(v):
  import jax.numpy as jnp
  for d in DISTS1:
    v = jnp.minimum(v, jnp.concatenate([v[:, d:], v[:, :d]], axis=1))
  return v


def body_proll10(v):
  import jax.numpy as jnp
  from jax.experimental.pallas import tpu as pltpu
  for d in DISTS0:
    v = jnp.minimum(v, pltpu.roll(v, -d % SHAPE[0], 0))
  for d in DISTS1:
    v = jnp.minimum(v, pltpu.roll(v, -d % SHAPE[1], 1))
  return v


def body_proll5_sub(v):
  import jax.numpy as jnp
  from jax.experimental.pallas import tpu as pltpu
  for d in DISTS0:
    v = jnp.minimum(v, pltpu.roll(v, -d % SHAPE[0], 0))
  return v


def body_proll5_lane(v):
  import jax.numpy as jnp
  from jax.experimental.pallas import tpu as pltpu
  for d in DISTS1:
    v = jnp.minimum(v, pltpu.roll(v, -d % SHAPE[1], 1))
  return v


def make_body_dist(axis, d):
  """Five identical rolls of distance d along axis, chained with min."""
  import jax.numpy as jnp

  def body(v):
    for _ in range(5):
      if axis == 0:
        v = jnp.minimum(v, jnp.concatenate([v[d:], v[:d]], axis=0))
      else:
        v = jnp.minimum(v, jnp.concatenate([v[:, d:], v[:, :d]], axis=1))
    return v

  return body


def body_indep10(v):
  """Ten rolls all reading the ORIGINAL v (wide, not chained): does
  instruction-level parallelism change the per-roll cost?"""
  import jax.numpy as jnp
  acc = v
  for d in DISTS0:
    acc = jnp.minimum(acc, jnp.concatenate([v[d:], v[:d]], axis=0))
  for d in DISTS1:
    acc = jnp.minimum(acc, jnp.concatenate([v[:, d:], v[:, :d]], axis=1))
  return acc


def chain_on_chunk(w):
  """The same 10-step chain on a (K+MARGIN0, C) value via static
  shrinking slices (sublane axis) + concat-rolls (lane axis)."""
  import jax.numpy as jnp
  for d in DISTS0:
    w = jnp.minimum(w[:-d], w[d:])
  for d in DISTS1:
    w = jnp.minimum(w, jnp.concatenate([w[:, d:], w[:, :d]], axis=1))
  return w


def make_body_chunk(k_rows, lane_tile=None):
  import jax.numpy as jnp

  def body(v):
    rows, cols = SHAPE
    chunks = []
    for r0 in range(0, rows, k_rows):
      # wrap-pad the tail so every chunk sees a full margin
      hi = r0 + k_rows + MARGIN0
      if hi <= rows:
        w = v[r0:hi]
      else:
        w = jnp.concatenate([v[r0:], v[:hi - rows]], axis=0)
      if lane_tile is None:
        chunks.append(chain_on_chunk(w))
      else:
        tiles = [chain_on_chunk(w[:, c0:c0 + lane_tile])
                 for c0 in range(0, cols, lane_tile)]
        chunks.append(jnp.concatenate(tiles, axis=1))
    return jnp.concatenate(chunks, axis=0)

  return body


def main():
  import jax
  import jax.numpy as jnp

  log('device: %s' % jax.devices()[0])
  rng = np.random.RandomState(0)
  x0 = jnp.asarray(rng.randint(-30000, 30000, SHAPE, np.int32))
  cells = float(SHAPE[0] * SHAPE[1])

  def run(tag, body, steps):
    try:
      dt = slope(lambda n: pallas_loop(body, n), x0)
      slots = 3.9e12 * dt / cells
      log('%-12s: %7.1f us/iter  %5.1f slots/cell  %4.1f slots/step' %
          (tag, dt * 1e6, slots, slots / steps))
    except Exception as e:  # noqa: BLE001
      first = (str(e).splitlines() or [repr(e)])[0]
      log('%-12s: FAILED %s' % (tag, first[:140]))

  if '--dists' in sys.argv:
    for d in (1, 2, 7, 8, 16, 64):
      run('sub_d%d' % d, make_body_dist(0, d), 5)
    for d in (1, 2, 7, 8, 64, 128, 256, 512):
      run('lane_d%d' % d, make_body_dist(1, d), 5)
    return

  run('ew10', body_ew10_real, 10)
  run('roll10', body_roll10, 10)
  run('proll10', body_proll10, 10)
  run('indep10', body_indep10, 10)
  run('proll5_sub', body_proll5_sub, 5)
  run('proll5_lane', body_proll5_lane, 5)
  for k in (32, 128):
    run('chunk%d' % k, make_body_chunk(k), 10)
  run('chunk64x512', make_body_chunk(64, 512), 10)


if __name__ == '__main__':
  main()
