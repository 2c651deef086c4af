"""CLI driver tests (the analog of the reference's sodac invocations in
tests/*.sh)."""

import json
import subprocess
import sys

import pathlib

import pytest

from soda_tpu import corpus

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def run_cli(args, stdin_text=None):
  return subprocess.run(
      [sys.executable, '-m', 'soda_tpu'] + args,
      input=stdin_text, capture_output=True, text=True, cwd=REPO,
      env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': REPO, 'HOME': '/root'})


def test_emit_jax_stdout():
  r = run_cli(['-', '--emit-jax', '-'], corpus.CORPUS['blur'])
  assert r.returncode == 0, r.stderr
  assert 'def compute(' in r.stdout
  assert 'kernel: blur' in r.stdout


def test_emit_dot(tmp_path):
  out = tmp_path / 'plan.dot'
  r = run_cli(['-', '--emit-dot', str(out)], corpus.CORPUS['sobel2d'])
  assert r.returncode == 0, r.stderr
  text = out.read_text()
  assert 'digraph' in text and 'mag_x' in text


def test_estimate(tmp_path):
  out = tmp_path / 'est.json'
  r = run_cli(['-', '--estimate', str(out), '--shape', '512,64'],
              corpus.CORPUS['jacobi2d'])
  assert r.returncode == 0, r.stderr
  est = json.loads(out.read_text())
  assert est['bound'] in ('memory', 'compute')
  assert est['vmem_ok'] is True
  assert est['stages'] == 2  # iterate: 2
  # dispatch-overhead model: est_time folds the fixed per-grid-step
  # cost on top of the pure roofline; more steps -> more overhead
  assert est['grid_steps'] == -(-512 // est['block_rows'])
  assert est['est_time_s'] >= est['ideal_time_s']
  assert est['est_roofline_frac'] <= est['model_roofline_frac']


def test_run_self_test_passes():
  r = run_cli(['-', '--run', '--backend', 'xla', '--shape', '32,64'],
              corpus.CORPUS['blur'])
  assert r.returncode == 0, r.stderr + r.stdout
  assert 'PASS' in r.stdout


def test_run_with_cr_override():
  r = run_cli(['-', '--run', '--backend', 'xla', '--shape', '32,64',
               '--computation-reuse', 'greedy'],
              corpus.CORPUS['erosion'].replace('(480, *)', '(64, *)'))
  assert r.returncode == 0, r.stderr + r.stdout
  assert 'PASS' in r.stdout


def test_invalid_program_errors():
  r = run_cli(['-', '--run'], 'kernel: broken\n')
  assert r.returncode != 0


def test_no_action_errors():
  r = run_cli(['-'], corpus.CORPUS['blur'])
  assert r.returncode != 0


def test_run_with_kernel_opts():
  """--kernel-opt KEY=VALUE forwards explicit fused-kernel config
  (ints, bools, and mode strings) to the Pallas executor."""
  r = run_cli(['-', '--run', '--backend', 'pallas', '--shape', '64,64',
               '--kernel-opt', 'block_rows=16',
               '--kernel-opt', 'stage_mode=value',
               '--kernel-opt', 'shift_mode=roll',
               '--kernel-opt', 'stream_loop=peel',
               '--kernel-opt', 'prefetch=3'],
              corpus.CORPUS['blur'])
  assert r.returncode == 0, r.stderr + r.stdout
  assert 'PASS' in r.stdout


def test_kernel_opts_exclusive_with_tune():
  r = run_cli(['-', '--run', '--tune', '--shape', '64,64',
               '--kernel-opt', 'block_rows=16'],
              corpus.CORPUS['blur'])
  assert r.returncode != 0
  assert 'mutually exclusive' in r.stderr


def test_kernel_opts_rejected_for_xla():
  r = run_cli(['-', '--run', '--backend', 'xla', '--shape', '64,64',
               '--kernel-opt', 'block_rows=16'],
              corpus.CORPUS['blur'])
  assert r.returncode != 0


def test_kernel_opt_unknown_key_clean_error():
  r = run_cli(['-', '--run', '--backend', 'pallas', '--shape', '64,64',
               '--kernel-opt', 'block_row=16'],  # typo
              corpus.CORPUS['blur'])
  assert r.returncode != 0
  assert 'unknown --kernel-opt key' in r.stderr
  assert 'Traceback' not in r.stderr


def test_kernel_opt_bad_value_clean_error():
  r = run_cli(['-', '--run', '--backend', 'pallas', '--shape', '64,64',
               '--kernel-opt', 'prefetch=9'],
              corpus.CORPUS['blur'])
  assert r.returncode != 0
  assert 'ERROR' in r.stderr
  assert 'Traceback' not in r.stderr


def test_estimate_honors_kernel_opts(tmp_path):
  """--kernel-opt applies to --estimate too (r3 review find: it was
  silently ignored outside --run)."""
  out = tmp_path / 'est.json'
  r = run_cli(['-', '--estimate', str(out), '--shape', '512,512',
               '--kernel-opt', 'block_rows=16',
               '--kernel-opt', 'stream_loop=true'],
              corpus.CORPUS['jacobi2d'])
  assert r.returncode == 0, r.stderr
  est = json.loads(out.read_text())
  assert est['block_rows'] == 16
  # stream_loop: one dispatch, not one per grid step
  assert est['grid_step_overhead_s'] < est['grid_steps'] * 1e-6 + 1e-12


def test_kernel_opt_rejected_for_estimate_typo():
  r = run_cli(['-', '--estimate', '-', '--shape', '64,64',
               '--kernel-opt', 'bogus=1'],
              corpus.CORPUS['blur'])
  assert r.returncode != 0
  assert 'unknown --kernel-opt key' in r.stderr
