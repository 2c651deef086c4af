"""Round-5 experiment 48: is the per-process timing lottery in the
BINARY (remote compile-server codegen draw) or in EXECUTION state
(program load address / tunnel session)?

exp47 established: process history is irrelevant, but one same-day
process drew jacobi2d bare-peel at 0.190 ms (the exp43 "0.82
sighting") while another drew 0.264 ms, and exp46's process drew
denoise2d roll-b128 at 0.282 ms where the record process drew 0.387.
exp43's "byte-identical" check compared generated_code_size only.

Method: N fresh child processes (one at a time — chip discipline),
each compiles jacobi2d bare-peel + denoise2d roll-b128, times each
(slope, reps=2), and fingerprints the compiled executable
(generated_code_size + sha1 of compiled.as_text() when available).
Same fingerprint + different timing => execution-state lottery
(nothing to harvest); different fingerprints correlated with timing
=> compile lottery (a best-of-N-compiles protocol could harvest it).

Run ON TPU (alone): python experiments/exp48_lottery.py [N]
"""

import hashlib
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


CASES = {
    'jacobi2d': {'stream_loop': 'peel'},
    'denoise2d': {'block_rows': 128, 'stage_mode': 'value',
                  'shift_mode': 'roll'},
}


def child():
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes, peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  rows = {r[0]: r for r in bench_mod.CONFIGS}
  out = {}
  for name, cfg in CASES.items():
    _, shape, overrides, _ = rows[name][:4]
    st = corpus.build(name, **overrides)
    ex = PallasExecutor(st, shape, **cfg)
    inputs = reference.make_test_inputs(st, shape)
    args = list(ex.prepare(inputs))
    in_b, out_b = stream_bytes(st, shape)
    dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                       (in_b + out_b) / (peak * 1e9), reps=2)
    lowered = jax.jit(lambda *a: ex.fn(*a)).lower(*args)
    compiled = lowered.compile()
    size = None
    try:
      size = compiled.memory_analysis().generated_code_size_in_bytes
    except Exception:  # noqa: BLE001
      pass
    text_hash = None
    try:
      text_hash = hashlib.sha1(
          compiled.as_text().encode()).hexdigest()[:12]
    except Exception:  # noqa: BLE001
      pass
    out[name] = {'ms': round(dt * 1e3, 4), 'code_size': size,
                 'hash': text_hash,
                 'frac': round((in_b + out_b) / dt / 1e9 / peak, 4)}
  print(json.dumps(out), flush=True)


def inprocess(n):
  """Is the draw per-COMPILE or per-process-sticky? Compile denoise2d
  n times in THIS process (clearing jax caches between builds), time
  + fingerprint each."""
  import jax
  import bench as bench_mod
  from soda_tpu import corpus
  from soda_tpu.backend import reference
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  from soda_tpu.profiling import chain_input_index, slope_time, \
      stream_bytes, peak_bandwidth
  peak = peak_bandwidth(jax.devices()[0])
  rows = {r[0]: r for r in bench_mod.CONFIGS}
  name = 'denoise2d'
  _, shape, overrides, _ = rows[name][:4]
  st = corpus.build(name, **overrides)
  cfg = CASES[name]
  inputs = reference.make_test_inputs(st, shape)
  in_b, out_b = stream_bytes(st, shape)
  best = None
  for i in range(n):
    jax.clear_caches()
    ex = PallasExecutor(st, shape, **cfg)
    args = list(ex.prepare(inputs))
    dt, _ = slope_time(ex.fn, args, chain_input_index(st),
                       (in_b + out_b) / (peak * 1e9), reps=2)
    lowered = jax.jit(lambda *a: ex.fn(*a)).lower(*args)
    compiled = lowered.compile()
    try:
      h = hashlib.sha1(compiled.as_text().encode()).hexdigest()[:12]
    except Exception:  # noqa: BLE001
      h = '?'
    frac = (in_b + out_b) / dt / 1e9 / peak
    log('build %d %.3f ms frac=%.3f hash=%s' % (i, dt * 1e3, frac, h))
    if best is None or dt < best[0]:
      best = (dt, h)
  log('best: %.3f ms hash=%s' % (best[0] * 1e3, best[1]))


def main():
  if '--child' in sys.argv:
    child()
    return
  if '--inprocess' in sys.argv:
    inprocess(int(sys.argv[-1]) if sys.argv[-1].isdigit() else 4)
    return
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
  draws = []
  for i in range(n):
    r = subprocess.run([sys.executable, str(ROOT / 'experiments' /
                                            'exp48_lottery.py'),
                        '--child'],
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
      log('child %d FAILED: %s' % (i, r.stderr.strip().splitlines()[-1]))
      continue
    d = json.loads(r.stdout.strip().splitlines()[-1])
    draws.append(d)
    for name, row in d.items():
      log('draw %d %-10s %.3f ms frac=%.3f size=%s hash=%s' %
          (i, name, row['ms'], row['frac'], row['code_size'],
           row['hash']))
  for name in CASES:
    pairs = [(d[name]['hash'], d[name]['ms']) for d in draws if name in d]
    hashes = {h for h, _ in pairs}
    times = [ms for _, ms in pairs]
    spread = (max(times) / min(times) - 1) * 100 if times else 0
    log('%s: %d distinct binaries over %d draws, timing spread %.1f%%'
        % (name, len(hashes), len(pairs), spread))


if __name__ == '__main__':
  main()
