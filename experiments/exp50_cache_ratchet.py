"""Round-5 experiment 50: can the persistent compile cache PIN a
compile-lottery draw?

exp48 established the denoise2d-class timing spread is a per-process
remote-Mosaic compile lottery (4 fresh processes -> 4 distinct
binaries, 31% spread) and that in-process rebuilds are sticky, so only
a fresh subprocess re-rolls. The bench redraw pass therefore re-rolls
blindly every run — the record keeps whatever today's draws happen to
be.

Question: does JAX's persistent compilation cache (soda_tpu/cache.py,
already enabled in the bench parent) capture the Pallas/Mosaic
executable on the axon platform, such that a SECOND fresh process
cache-HITS and reproduces the first process's binary AND its timing?
If yes, the lottery becomes a ratchet: harvest draws in throwaway
cache dirs, promote the fastest draw's entry into the shared cache,
and every later run (including the driver's record run) deterministically
gets the fast binary.

Method (one child at a time — chip discipline):
  1. child A, fresh private cache dir D: compile + slope-time the
     kernel at its current tune-cache winner config; report ms,
     compile seconds, executable fingerprint, files written to D.
  2. child B, SAME dir D: expect compile-hit (seconds, not minutes),
     IDENTICAL fingerprint, and timing in A's class.
  3. child C, cache disabled: independent draw for spread context.

Run ON TPU (alone): python experiments/exp50_cache_ratchet.py [kernel]
"""

import hashlib
import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def child(name, cache_dir):
  import jax
  if cache_dir != 'none':
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes, peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  row = next(r for r in bench_mod.CONFIGS if r[0] == name)
  shape, overrides = row[1], row[2]
  meta = row[4] if len(row) > 4 else {}
  st = corpus.build(meta.get('kernel') or name, **overrides)
  from soda_tpu.tools import autotune
  tkey = autotune._key(st, tuple(shape), jax.devices()[0].device_kind)
  ttable = autotune._load(os.path.expanduser(autotune.DEFAULT_CACHE))
  cfg = dict(ttable.get(tkey, {}).get('config') or {})
  ex = PallasExecutor(st, shape, **cfg)
  inputs = reference.make_test_inputs(st, shape)
  args = list(ex.prepare(inputs))
  t0 = time.monotonic()
  lowered = jax.jit(lambda *a: ex.fn(*a)).lower(*args)
  compiled = lowered.compile()
  compile_s = time.monotonic() - t0
  in_b, out_b = stream_bytes(st, shape)
  dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                     (in_b + out_b) / (peak * 1e9), reps=2)
  out = {
      'ms': round(dt * 1e3, 4),
      'frac': round((in_b + out_b) / dt / 1e9 / peak, 4),
      'compile_s': round(compile_s, 1),
      'cfg': cfg,
      'hash': hashlib.sha1(compiled.as_text().encode()).hexdigest()[:12],
      'cache_files': (sorted(os.listdir(cache_dir))
                      if cache_dir != 'none' else None),
  }
  print(json.dumps(out), flush=True)


def run_child(name, cache_dir, tag):
  cmd = [sys.executable, __file__, '--child', name, cache_dir]
  r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                     cwd=str(ROOT))
  try:
    out = json.loads(r.stdout.strip().splitlines()[-1])
  except Exception:
    log(tag, 'FAILED:', r.stderr[-400:])
    return None
  log('%-10s ms=%-8s frac=%-7s compile=%-6ss hash=%s files=%d' %
      (tag, out['ms'], out['frac'], out['compile_s'], out['hash'],
       len(out['cache_files'] or [])))
  return out


def main():
  if len(sys.argv) >= 2 and sys.argv[1] == '--child':
    child(sys.argv[2], sys.argv[3])
    return
  name = sys.argv[1] if len(sys.argv) > 1 else 'denoise2d'
  d = '/tmp/exp50_cache_%s' % name
  shutil.rmtree(d, ignore_errors=True)
  a = run_child(name, d, 'A(fresh)')
  b = run_child(name, d, 'B(reuse)')
  c = run_child(name, 'none', 'C(nocache)')
  if a and b:
    hit = b['compile_s'] < max(10.0, 0.3 * a['compile_s'])
    same = a['hash'] == b['hash']
    close = abs(a['ms'] - b['ms']) / a['ms'] < 0.05
    log('VERDICT: cache_hit=%s same_binary=%s timing_reproduced=%s'
        % (hit, same, close))
    log('RATCHET %s' % ('VIABLE' if (hit and same and close)
                        else 'REFUTED'))


if __name__ == '__main__':
  main()
