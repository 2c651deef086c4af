"""Round-5 experiment 51: is the compile lottery PYTHONHASHSEED?

exp50 refuted the persistent-cache ratchet in a diagnostic way: a
child REUSING another child's cache dir still compiled a different
binary under different cache keys — so the per-process draw is decided
at Python LOWERING time (the serialized HLO / Mosaic payload itself
differs across processes), not inside the remote compile server.
Per-process-sticky + cross-process-varying + survives
jax.clear_caches() (exp48) is exactly the signature of Python hash
randomization: set iteration order changes instruction order in the
lowered module.

Test: children with pinned PYTHONHASHSEED.
  - two children, SAME seed  -> expect IDENTICAL binary + timing
  - children with different seeds -> expect the exp48 spread
If confirmed, the lottery is harvestable deterministically: sweep
seeds offline, pin the best per kernel (or fix one good seed for the
bench process), and the record stops depending on the draw.

Run ON TPU (alone):
  python experiments/exp51_hashseed.py denoise2d 1 1 2 3 0
(trailing args = hash seeds; repeated seed = reproducibility check)
"""

import hashlib
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def child(name, cfg_json=None):
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes, peak_bandwidth
  from soda_tpu.tools import autotune
  peak = peak_bandwidth(jax.devices()[0])
  row = next(r for r in bench_mod.CONFIGS if r[0] == name)
  shape, overrides = row[1], row[2]
  meta = row[4] if len(row) > 4 else {}
  st = corpus.build(meta.get('kernel') or name, **overrides)
  if cfg_json:
    cfg = json.loads(cfg_json)
  else:
    tkey = autotune._key(st, tuple(shape), jax.devices()[0].device_kind)
    ttable = autotune._load(os.path.expanduser(autotune.DEFAULT_CACHE))
    cfg = dict(ttable.get(tkey, {}).get('config') or {})
  ex = PallasExecutor(st, shape, **cfg)
  inputs = reference.make_test_inputs(st, shape)
  args = list(ex.prepare(inputs))
  t0 = time.monotonic()
  lowered = jax.jit(lambda *a: ex.fn(*a)).lower(*args)
  stable = lowered.as_text()
  compiled = lowered.compile()
  compile_s = time.monotonic() - t0
  in_b, out_b = stream_bytes(st, shape)
  dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                     (in_b + out_b) / (peak * 1e9), reps=2)
  print(json.dumps({
      'ms': round(dt * 1e3, 4),
      'frac': round((in_b + out_b) / dt / 1e9 / peak, 4),
      'compile_s': round(compile_s, 1),
      'hashseed': os.environ.get('PYTHONHASHSEED'),
      'stablehlo_sha': hashlib.sha1(stable.encode()).hexdigest()[:12],
      'exec_sha': hashlib.sha1(
          compiled.as_text().encode()).hexdigest()[:12],
  }), flush=True)


def main():
  if len(sys.argv) >= 2 and sys.argv[1] == '--child':
    child(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    return
  name = sys.argv[1] if len(sys.argv) > 1 else 'denoise2d'
  cfg_json = None
  rest = sys.argv[2:]
  if rest and rest[0].startswith('{'):
    cfg_json, rest = rest[0], rest[1:]
  seeds = rest or ['1', '1', '2', '3', '0']
  for s in seeds:
    env = dict(os.environ, PYTHONHASHSEED=s)
    cmd = [sys.executable, __file__, '--child', name] + (
        [cfg_json] if cfg_json else [])
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=900, cwd=str(ROOT), env=env)
    try:
      out = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
      log('seed %-4s FAILED: %s' % (s, r.stderr[-300:]))
      continue
    log('seed %-4s ms=%-8s frac=%-7s compile=%-5ss hlo=%s exec=%s' %
        (s, out['ms'], out['frac'], out['compile_s'],
         out['stablehlo_sha'], out['exec_sha']))


if __name__ == '__main__':
  main()
