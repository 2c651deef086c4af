"""sodac-tpu: the command-line driver.

Rebuild of the reference CLI (/root/reference/src/soda/sodac.py): parse
a .soda program (file or stdin), apply directive overrides, construct
the Stencil, and dispatch backend actions. The FPGA codegen targets are
replaced by TPU-native ones:

  --emit-jax FILE     print a standalone JAX program  (was: HLS C++)
  --emit-dot FILE     graphviz of the fusion plan     (dataflow.py:36)
  --estimate FILE     analytic roofline/VMEM estimate (model/xilinx.py)
  --run               execute + self-test vs the NumPy oracle, print
                      throughput (was: generated host's SODA_TEST_MAIN)
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import Optional

from soda_tpu import utils


def _build_parser() -> argparse.ArgumentParser:
  parser = argparse.ArgumentParser(
      prog='sodac-tpu',
      description='SODA-TPU stencil compiler (JAX/XLA/Pallas backends)')
  parser.add_argument('--verbose', '-v', action='count', default=0,
                      help='increase verbosity')
  parser.add_argument('--quiet', '-q', action='count', default=0,
                      help='decrease verbosity')
  parser.add_argument('--recursion-limit', type=int, default=3000,
                      help='Python recursion limit')
  parser.add_argument('soda_src', metavar='FILE',
                      help='SODA program, or - for stdin')

  override = parser.add_argument_group('directive overrides',
                                       'override in-file DSL directives '
                                       '(reference sodac.py:45-93)')
  override.add_argument('--burst-width', type=int)
  override.add_argument('--unroll-factor', type=int)
  override.add_argument('--replication-factor', type=int)
  override.add_argument('--tile-size', type=str,
                        help='comma-separated, e.g. 2048 or 128,128')
  override.add_argument('--dram-in', type=str)
  override.add_argument('--dram-out', type=str)
  override.add_argument('--iterate', type=int)
  override.add_argument('--border', choices=('ignore', 'preserve'))
  override.add_argument('--cluster',
                        choices=('none', 'fine', 'coarse', 'full'))

  opt = parser.add_argument_group('optimizations')
  opt.add_argument('--computation-reuse',
                   choices=('no', 'yes', 'greedy', 'optimal', 'beam',
                            'glore', 'external', 'built-in',
                            'built-in:greedy', 'built-in:optimal'),
                   default='no')
  opt.add_argument('--cr-cost', choices=('ops', 'tpu'), default=None,
                   help='computation-reuse schedule objective: ops = '
                        'the reference (num_ops, reuse distance) tuple '
                        '(default); tpu = measured shift-slot '
                        'scalarization (prefers 8-aligned sublane / '
                        'vreg-multiple lane reuse distances and may '
                        'trade +1 op for a cheaper shift set)')
  opt.add_argument('--inline', action='store_true')
  opt.add_argument('--distribute', action='store_true',
                   help='factor shared coefficients: a*c + b*c -> (a+b)*c')
  opt.add_argument('--no-separable', action='store_true',
                   help='disable rank-1 separable factorization of '
                        'linear stages (on by default)')

  backend = parser.add_argument_group('backends')
  backend.add_argument('--emit-jax', metavar='FILE',
                       help='generate a standalone JAX program (- = stdout)')
  backend.add_argument('--emit-numpy', metavar='FILE',
                       help='generate a pure-NumPy reference program')
  backend.add_argument('--emit-dot', metavar='FILE',
                       help='dump the fusion-plan DAG as graphviz')
  backend.add_argument('--estimate', metavar='FILE',
                       help='write the analytic performance estimate JSON')
  backend.add_argument('--model-file', metavar='FILE',
                       help='JSON overriding the device model for '
                            '--estimate ({"hbm_gbps": .., '
                            '"vpu_gflops": ..}; the analog of the '
                            'reference --model-file, model/xilinx.py)')
  backend.add_argument('--compile-stats', metavar='FILE',
                       help='compile the fused kernel and dump XLA cost/'
                            'memory analysis (the csynth-report analog)')
  backend.add_argument('--run', action='store_true',
                       help='execute and self-test against the oracle')
  backend.add_argument('--bench', action='store_true',
                       help='with --run: time the kernel, print pixel/ns')
  backend.add_argument('--backend',
                       choices=('auto', 'xla', 'pallas', 'sharded', 'replicated'),
                       default='auto')
  backend.add_argument('--shape', type=str,
                       help='grid shape, comma-separated, streaming axis '
                            'first (default: derived from tile size)')
  backend.add_argument('--seed', type=int, default=0)
  backend.add_argument('--mesh', type=str,
                       help='device mesh shape for --backend sharded, '
                            'e.g. 8 or 4,2 (default: all devices x 1)')
  backend.add_argument('--tune', action='store_true',
                       help='with --run: probe block sizes / lane modes '
                            'on the attached device and cache the '
                            'winner (~/.cache/soda_tpu_tune.json)')
  backend.add_argument('--kernel-opt', action='append', default=[],
                       metavar='KEY=VALUE',
                       help='explicit fused-kernel config (repeatable): '
                            'block_rows=256 stage_mode=value '
                            'shift_mode=roll transpose_lanes=on '
                            'stream_loop=peel prefetch=3 ... — applies '
                            'to the pallas/auto backends (and, with '
                            '--backend sharded, to the per-shard '
                            'kernel); mutually exclusive with --tune')
  return parser


def _kernel_opt_keys():
  """Valid --kernel-opt keys = PallasExecutor's config kwargs."""
  import inspect
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  params = inspect.signature(PallasExecutor.__init__).parameters
  return sorted(set(params) - {'self', 'stencil', 'shape'})


def _parse_kernel_opts(pairs):
  """KEY=VALUE list -> executor kwargs (ints, bools, and the literal
  mode strings pass through). Unknown keys raise ValueError so typos
  land as a clean CLI error, not an executor traceback."""
  opts = {}
  valid = _kernel_opt_keys()
  for pair in pairs:
    key, sep, value = pair.partition('=')
    if not sep or not key:
      raise ValueError('--kernel-opt expects KEY=VALUE, got %r' % pair)
    key = key.replace('-', '_')
    if key not in valid:
      raise ValueError('unknown --kernel-opt key %r (valid: %s)' %
                       (key, ', '.join(valid)))
    low = value.lower()
    if low in ('true', 'yes'):
      opts[key] = True
    elif low in ('false', 'no'):
      opts[key] = False
    else:
      try:
        opts[key] = int(value)
      except ValueError:
        opts[key] = value
  return opts


def _parse_ints(text: str):
  try:
    return tuple(int(x) for x in text.split(','))
  except ValueError:
    raise utils.InputError(
        'expected comma-separated integers (e.g. 1000,1000), got %r'
        % text) from None


def _probe_device(timeout_s: float):
  """First attached device, or None if none answers within the
  timeout (bounded because jax.devices() hangs on a dead link)."""
  devices = utils.probe_devices(timeout_s)
  return devices[0] if devices else None


def _default_shape(stencil):
  rest = tuple(reversed(stencil.tile_size[:-1]))
  return (256,) + rest


def main(argv: Optional[list] = None) -> int:
  """CLI entry; user-input errors exit 1 with a one-line message
  (reference sodac exits 1 on SemanticError, soda/sodac.py:146-152)."""
  try:
    return _main(argv)
  except utils.InputError as e:
    print('sodac-tpu: error: %s' % e, file=sys.stderr)
    return 1


def _main(argv: Optional[list] = None) -> int:
  parser = _build_parser()
  args = parser.parse_args(argv)
  sys.setrecursionlimit(args.recursion_limit)
  level = logging.WARNING - 10 * args.verbose + 10 * args.quiet
  logging.basicConfig(
      level=max(logging.DEBUG, min(logging.CRITICAL, level)),
      format='%(levelname)s:%(name)s:%(lineno)d: %(message)s')

  if args.soda_src == '-':
    source = sys.stdin.read()
  else:
    with open(args.soda_src) as f:
      source = f.read()

  overrides = {}
  for key in ('burst_width', 'unroll_factor', 'replication_factor',
              'iterate', 'border', 'cluster', 'dram_in', 'dram_out'):
    value = getattr(args, key)
    if value is not None:
      overrides[key] = value
  if args.tile_size:
    overrides['tile_size'] = _parse_ints(args.tile_size) + (0,)
  optimizations = {}
  if args.computation_reuse != 'no':
    optimizations['computation-reuse'] = args.computation_reuse
  if args.cr_cost is not None:
    optimizations['cr-cost'] = args.cr_cost
  if args.inline:
    optimizations['inline'] = True
  if args.distribute:
    optimizations['distribute'] = True
  if args.no_separable:
    optimizations['separable'] = 'no'
  if optimizations:
    overrides['optimizations'] = optimizations

  # --kernel-opt is parsed and validated ONCE, up front, so typos and
  # conflicts error loudly for EVERY action (--run/--estimate/
  # --compile-stats), not just --run
  try:
    kernel_opts = _parse_kernel_opts(args.kernel_opt)
  except ValueError as e:
    parser.error(str(e))
    return 1
  if kernel_opts:
    if args.tune:
      parser.error('--kernel-opt and --tune are mutually exclusive')
      return 1
    if args.backend == 'xla':
      parser.error('--kernel-opt configures the fused Pallas kernel; '
                   'the xla backend has no such knobs')
      return 1

  from soda_tpu import api
  try:
    stencil = api.build_stencil(source, **overrides)
  except utils.SemanticError as e:
    parser.error('invalid SODA program: %s' % e)
    return 1

  did_something = False
  for emit_arg, target in ((args.emit_jax, 'jax'),
                           (args.emit_numpy, 'numpy')):
    if not emit_arg:
      continue
    from soda_tpu.codegen import jax_source
    shape = _parse_ints(args.shape) if args.shape else None
    if emit_arg == '-':
      jax_source.print_code(stencil, sys.stdout, shape, target)
    else:
      with open(emit_arg, 'w') as f:
        jax_source.print_code(stencil, f, shape, target)
    did_something = True

  if args.emit_dot:
    from soda_tpu.backend.plan import make_plan
    plan = make_plan(stencil)
    text = plan.dot()
    if args.emit_dot == '-':
      sys.stdout.write(text + '\n')
    else:
      with open(args.emit_dot, 'w') as f:
        f.write(text + '\n')
    did_something = True

  if args.estimate:
    from soda_tpu.model import estimate as model
    shape = _parse_ints(args.shape) if args.shape else \
        _default_shape(stencil)
    # opportunistic device probe for the model's device table; bounded
    # because jax.devices() HANGS (not raises) when the TPU link is
    # down, and an analytic estimate must never block on hardware
    device = _probe_device(timeout_s=10.0)
    model_params = None
    if getattr(args, 'model_file', None):
      import json as json_mod
      with open(args.model_file) as f:
        model_params = json_mod.load(f)
    if args.estimate == '-':
      model.print_estimation(stencil, shape, sys.stdout, device,
                             model_params, kernel_opts)
    else:
      with open(args.estimate, 'w') as f:
        model.print_estimation(stencil, shape, f, device, model_params,
                               kernel_opts)
    did_something = True

  if args.compile_stats:
    import json as json_mod
    from soda_tpu.backend import reference
    from soda_tpu.backend.pallas_kernel import PallasExecutor
    from soda_tpu.model.compiled import compiled_stats
    shape = _parse_ints(args.shape) if args.shape else \
        _default_shape(stencil)
    executor = PallasExecutor(stencil, shape, **kernel_opts)
    inputs = reference.make_test_inputs(stencil, shape)
    params = reference.make_test_params(stencil)
    stats = compiled_stats(executor, inputs, params)
    text = json_mod.dumps(stats, indent=2, default=str) + '\n'
    if args.compile_stats == '-':
      sys.stdout.write(text)
    else:
      with open(args.compile_stats, 'w') as f:
        f.write(text)
    did_something = True

  if args.run:
    did_something = True
    # persistent XLA compilation cache: repeat runs of the same
    # stencil/shape skip the 20-40 s first compile (the analog of the
    # reference's stencil-text-keyed floorplan cache, cluster.py:104-160)
    from soda_tpu import cache as _cache
    try:
      _cache.enable()
    except Exception as e:  # noqa: BLE001 - cache is best-effort
      logging.getLogger().warning('compilation cache disabled: %r', e)
    code = _run(stencil, args, kernel_opts)
    if code:
      return code

  if not did_something:
    parser.error('no action requested '
                 '(--emit-jax/--emit-dot/--estimate/--run)')
  return 0


def _run(stencil, args, kernel_opts) -> int:
  """Execute on random inputs and verify against the NumPy oracle —
  the analog of running the generated host with SODA_TEST_MAIN."""
  import numpy as np
  from soda_tpu import utils as _utils
  from soda_tpu.backend import reference

  # the TPU tunnel HANGS jax.devices() (never raises) when it is down;
  # probe in a SUBPROCESS (an in-thread probe would poison this
  # process's backend-init lock on timeout) and degrade to CPU loudly
  # rather than hang forever. Skip the probe when CPU is already the
  # configured platform (tests, explicit JAX_PLATFORMS=cpu).
  import jax
  cpu_only = (jax.config.jax_platforms or '').split(',') == ['cpu']
  if not cpu_only and not _utils.device_reachable(timeout_s=20.0):
    logging.getLogger().warning(
        'no device answered within 20 s (TPU tunnel down?) — '
        'falling back to CPU (Pallas in interpret mode)')
    import jax
    jax.config.update('jax_platforms', 'cpu')

  shape = _parse_ints(args.shape) if args.shape else _default_shape(stencil)
  inputs = reference.make_test_inputs(stencil, shape, seed=args.seed)
  params = reference.make_test_params(stencil)
  want = reference.run(stencil, inputs, params)

  backend = args.backend
  if getattr(args, 'tune', False) and backend in ('auto', 'pallas'):
    from soda_tpu.tools.autotune import tuned_executor
    executor = tuned_executor(stencil, shape)
  elif backend == 'replicated':
    # R independent grids batch through one vmapped launch; the
    # self-test runs the SAME grid in every batch slot and checks
    # slot 0 against the oracle (reference replication semantics:
    # identical pipelines over independent tiles, core.py:565-614)
    from soda_tpu.backend import get_executor
    inner = get_executor(stencil, shape, backend)
    r = inner.replication_factor

    class _Batched:
      replication_factor = r

      def __call__(self, ins, pars=None):
        batched = {k: np.stack([v] * r) for k, v in ins.items()}
        outs = inner(batched, pars)
        return {k: np.asarray(v)[0] for k, v in outs.items()}

    executor = _Batched()
  elif backend in ('auto', 'pallas', 'xla'):
    from soda_tpu.backend import get_executor
    try:
      executor = get_executor(stencil, shape, backend, **kernel_opts)
    except (ValueError, utils.InputError) as e:
      # bad --kernel-opt VALUES surface here (keys were pre-validated)
      print('ERROR: %s' % e, file=sys.stderr)
      return 1
  else:  # sharded
    from soda_tpu.parallel.spmd import ShardedExecutor
    mesh = None
    if args.mesh:
      import jax
      from jax.sharding import Mesh
      dims = _parse_ints(args.mesh)
      n = 1
      for d in dims:
        n *= d
      devices = np.array(jax.devices()[:n]).reshape(dims)
      mesh = Mesh(devices, tuple('xy'[:len(dims)]))
    try:
      if kernel_opts:
        # explicit kernel config implies the per-shard fused kernel
        executor = ShardedExecutor(stencil, shape, mesh=mesh,
                                   inner='pallas', inner_opts=kernel_opts)
      else:
        executor = ShardedExecutor(stencil, shape, mesh=mesh)
    except (ValueError, utils.InputError) as e:
      print('ERROR: %s' % e, file=sys.stderr)
      return 1

  t0 = time.perf_counter()
  outs = executor(inputs, params)
  compile_and_run_s = time.perf_counter() - t0

  import os
  # THRESHOLD env override, same knob as the generated hosts
  # (reference frt/host.py:633-641, xilinx/host.py:1201-1204)
  # squared-form criterion, reference frt/host.py:633-657 (their
  # ``threshold *= threshold``); default relaxed to 1e-4 for XLA/Mosaic
  # FMA contraction vs the individually-rounded oracle (tests/checks.py)
  default = utils.threshold_for(stencil.app_name)
  threshold = float(os.environ.get('THRESHOLD', repr(default))) ** 2
  errors = 0
  for name in stencil.output_names:
    if stencil.preserve_border:
      # preserve mode defines the WHOLE grid (boundary carries the
      # paired input) — compare it all, like the hardware gate
      got = np.asarray(outs[name])
      expect = np.asarray(want[name])
    else:
      region = reference.output_valid_slices(stencil, shape, name)
      got = np.asarray(outs[name])[region]
      expect = want[name][region]
    if stencil.symbol_table[name].is_float:
      d2 = (got.astype(np.float64) - expect.astype(np.float64)) ** 2
      w2 = expect.astype(np.float64) ** 2
      bad = (d2 > threshold) & (d2 > threshold * w2)
    else:
      bad = got != expect
    errors += int(bad.sum())
  cells = int(np.prod(shape))
  print('INFO: %s!' % ('FAIL' if errors else 'PASS'))
  print('Grid: %s (%d cells), backend=%s, compile+run %.3f s' %
        ('x'.join(map(str, shape)), cells, args.backend, compile_and_run_s))

  if args.bench:
    import jax
    from soda_tpu.profiling import (chain_input_index, slope_time,
                                    stream_bytes)
    dt = None
    try:
      # chained-loop slope timing: remote-attached devices ack
      # dispatches early, so single-call wall clock over-reports
      # (see soda_tpu.profiling.slope_time)
      chain_idx = chain_input_index(stencil)
      in_b, out_b = stream_bytes(stencil, shape)
      from soda_tpu.profiling import peak_bandwidth
      peak = peak_bandwidth(jax.devices()[0]) * 1e9
      args_pos = list(executor.prepare(inputs, params))
      dt, _ = slope_time(executor.fn, args_pos, chain_idx,
                         (in_b + out_b) / peak)
      gbps = (in_b + out_b) / dt / 1e9
      print('Effective HBM bandwidth: %.1f GB/s' % gbps)
    except Exception:  # noqa: BLE001 - unchainable: wall clock
      t0 = time.perf_counter()
      jax.block_until_ready(list(executor(inputs, params).values()))
      dt = time.perf_counter() - t0
    # same surface as the generated hosts (reference host.py:816-823)
    print('Kernel execution time: %.3f ms' % (dt * 1e3))
    print('Kernel throughput: %.6f pixel/ns' % (cells / dt / 1e9))
  return 1 if errors else 0


if __name__ == '__main__':
  sys.exit(main())
