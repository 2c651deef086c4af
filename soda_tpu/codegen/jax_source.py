"""Codegen backend: print a standalone JAX program for a stencil.

The analog of the reference's text-printing backends (hls_kernel.py /
ocl_kernel.py / host.py print C++/OpenCL; here we print Python/JAX).
The emitted module depends only on jax + numpy — NOT on soda_tpu — and
contains:

  * the original DSL and stencil analytics as a header docstring
    (meta-lines parity, reference core.py:639-651),
  * one function per kernel group computing all stages with shifted
    static slices under C arithmetic semantics,
  * a jitted `forward(...)` entry point and a `main()` self-test that
    fills ramp/random inputs and prints a checksum (the SODA_TEST_MAIN
    analog, frt/host.py:434-669).

Semantics parity is by construction: the statement expressions are
traced through the same C-semantics Evaluator used by every executor,
against a symbolic array namespace that emits source text.
"""

from __future__ import annotations

import io
from typing import Dict, Optional, Tuple

import numpy as np

from soda_tpu.backend import semantics
from soda_tpu.backend.plan import make_plan
from soda_tpu.ir import nodes as ir


class _Sym:
  """Symbolic array value: every operation emits a line of source."""

  __slots__ = ('b', 'name', 'dtype')

  def __init__(self, builder: '_SourceXp', name: str, dtype):
    self.b = builder
    self.name = name
    self.dtype = np.dtype(dtype) if dtype is not None else None

  def _bin(self, op, other, dtype=None):
    other_name = other.name if isinstance(other, _Sym) else repr(other)
    dt = dtype or self.dtype
    return self.b.temp('%s %s %s' % (self.name, op, other_name), dt)

  def _rbin(self, op, other):
    other_name = other.name if isinstance(other, _Sym) else repr(other)
    return self.b.temp('%s %s %s' % (other_name, op, self.name), self.dtype)

  def __add__(self, o):
    return self._bin('+', o)

  def __radd__(self, o):
    return self._rbin('+', o)

  def __sub__(self, o):
    return self._bin('-', o)

  def __rsub__(self, o):
    return self._rbin('-', o)

  def __mul__(self, o):
    return self._bin('*', o)

  def __rmul__(self, o):
    return self._rbin('*', o)

  def __truediv__(self, o):
    return self._bin('/', o)

  def __rtruediv__(self, o):
    # the rsqrt intrinsic evaluates as ``1 / sqrt(x)``
    return self._rbin('/', o)

  def __floordiv__(self, o):
    return self._bin('//', o)

  def __mod__(self, o):
    return self._bin('%', o)

  def __and__(self, o):
    return self._bin('&', o)

  def __or__(self, o):
    return self._bin('|', o)

  def __xor__(self, o):
    return self._bin('^', o)

  def __neg__(self):
    return self.b.temp('-%s' % self.name, self.dtype)

  def __invert__(self):
    return self.b.temp('~%s' % self.name, self.dtype)

  def __eq__(self, o):  # noqa: intentional symbolic comparison
    return self._bin('==', o, np.dtype(bool))

  def __ne__(self, o):
    return self._bin('!=', o, np.dtype(bool))

  def __lt__(self, o):
    return self._bin('<', o, np.dtype(bool))

  def __le__(self, o):
    return self._bin('<=', o, np.dtype(bool))

  def __gt__(self, o):
    return self._bin('>', o, np.dtype(bool))

  def __ge__(self, o):
    return self._bin('>=', o, np.dtype(bool))

  def __hash__(self):
    return id(self)

  def astype(self, dtype):
    dtype = np.dtype(dtype)
    return self.b.temp('%s.astype(np.%s)' % (self.name, dtype.name), dtype)

  @property
  def shape(self):  # only used by wrap() via asarray round-trips
    return ()


class _SourceXp:
  """numpy-workalike namespace that builds source instead of values."""

  def __init__(self, prefix='jnp'):
    self.lines = []
    self.counter = 0
    self.prefix = prefix

  def temp(self, expr: str, dtype) -> _Sym:
    name = '_t%d' % self.counter
    self.counter += 1
    self.lines.append('%s = %s' % (name, expr))
    return _Sym(self, name, dtype)

  def sym(self, expr: str, dtype) -> _Sym:
    return _Sym(self, expr, np.dtype(dtype) if dtype is not None else None)

  # -- numpy API surface used by semantics.Evaluator ---------------------------
  def asarray(self, v, dtype=None):
    if isinstance(v, _Sym):
      if dtype is not None and np.dtype(dtype) != v.dtype:
        return v.astype(dtype)
      return v
    if dtype is not None:
      return self.temp('%s.asarray(%r, np.%s)' % (self.prefix, v, np.dtype(dtype).name),
                       dtype)
    dt = np.dtype(type(v)) if isinstance(v, (int, float)) else None
    return self.temp('%s.asarray(%r)' % (self.prefix, v), dt)

  def trunc(self, v):
    return self.temp('%s.trunc(%s)' % (self.prefix, v.name), v.dtype)

  def where(self, c, a, b):
    an = a.name if isinstance(a, _Sym) else repr(a)
    bn = b.name if isinstance(b, _Sym) else repr(b)
    dt = a.dtype if isinstance(a, _Sym) else b.dtype
    return self.temp('%s.where(%s, %s, %s)' % (self.prefix, c.name, an, bn), dt)

  def _fn1(name):  # noqa: no self — decorator-style factory
    def method(self, v):
      return self.temp('%s.%s(%s)' % (self.prefix, name, v.name),
                       v.dtype)
    return method

  sqrt = _fn1('sqrt')
  exp = _fn1('exp')
  log = _fn1('log')
  sin = _fn1('sin')
  cos = _fn1('cos')
  tan = _fn1('tan')
  tanh = _fn1('tanh')
  floor = _fn1('floor')
  ceil = _fn1('ceil')
  round = _fn1('round')
  abs = _fn1('abs')
  logical_not = _fn1('logical_not')
  del _fn1

  def right_shift(self, a, k):
    kn = k.name if isinstance(k, _Sym) else repr(k)
    return self.temp('%s.right_shift(%s, %s)' % (self.prefix, a.name, kn),
                     a.dtype)

  def minimum(self, a, b):
    return self.temp('%s.minimum(%s, %s)' % (self.prefix, a.name, b.name), a.dtype)

  def maximum(self, a, b):
    return self.temp('%s.maximum(%s, %s)' % (self.prefix, a.name, b.name), a.dtype)

  def logical_and(self, a, b):
    return self.temp('%s.logical_and(%s, %s)' % (self.prefix, a.name, b.name),
                     np.dtype(bool))

  def logical_or(self, a, b):
    return self.temp('%s.logical_or(%s, %s)' % (self.prefix, a.name, b.name),
                     np.dtype(bool))

  def power(self, a, b):
    return self.temp('%s.power(%s, %s)' % (self.prefix, a.name, b.name), a.dtype)


def _slice_str(slices) -> str:
  return ', '.join('%s:%s' % (s[0], s[1]) for s in slices)


def _py_name(name: str) -> str:
  """Tensor name -> valid Python identifier (DSL allows keywords)."""
  import keyword
  return name + '_' if keyword.iskeyword(name) else name


def print_code(stencil, file, shape: Optional[Tuple[int, ...]] = None,
               target: str = 'jax') -> None:
  """Emit a standalone module computing ``stencil`` on grids of
  ``shape`` (array-axis order; streaming extent may be any value, the
  emitted code uses symbolic H). ``target`` selects the array
  namespace: 'jax' (jitted) or 'numpy' (pure-NumPy scalar reference —
  the printed analog of the reference's generated CPU check)."""
  if target not in ('jax', 'numpy'):
    raise ValueError('unknown codegen target: %s' % target)
  prefix = 'jnp' if target == 'jax' else 'np'
  plan = make_plan(stencil, 'full')
  dim = plan.dim
  if shape is None:
    shape = (512,) + tuple(reversed(stencil.tile_size[:-1]))
  w = file.write

  from soda_tpu.core.stencil import window_extent
  w('"""Generated by soda-tpu; standalone %s stencil program.\n\n'
    % ('JAX' if target == 'jax' else 'NumPy'))
  w('This program was generated from the following SODA DSL\n')
  w('(stencil window %s, stencil distance %d):\n\n' %
    (tuple(window_extent(stencil.stencil_window)),
     stencil.stencil_distance))
  w(str(stencil))
  w('\n"""\n\n')
  if target == 'jax':
    w('import jax\nimport jax.numpy as jnp\nimport numpy as np\n\n\n')
  else:
    w('import numpy as np\n\n\n')

  in_args = ', '.join(map(_py_name,
                          stencil.input_names + stencil.param_names))
  w('def compute(%s):\n' % in_args)
  w('  """All stencil stages over full grids; outputs zero outside\n'
    '  their valid regions."""\n')
  w('  _shape = %s.shape\n' % _py_name(stencil.input_names[0]))

  for stage in plan.stages:
    xp = _SourceXp(prefix)
    st_idx = stage.tensor.st_idx
    lo, hi = stage.lo, stage.hi

    def load(ref: ir.Ref, _lo=lo, _hi=hi, _st=st_idx, _xp=xp):
      if ref.name in stencil.param_names:
        return _xp.sym(
            '%s[%s]' % (_py_name(ref.name), ', '.join(map(str, ref.idx))),
            stencil.symbol_table[ref.name].np_dtype)
      slices = []
      for a in range(dim):
        d = dim - 1 - a
        delta = ref.idx[d] - _st[d]
        start = _lo[d] + delta  # >= 0 by the margin propagation
        stop_off = delta - _hi[d]
        stop = '_shape[%d]%s' % (a, '%+d' % stop_off if stop_off else '')
        slices.append((start, stop))
      dtype = None
      if ref.dtype is not None:
        dtype = ref.dtype.np_dtype
      elif ref.name in stencil.symbol_table:
        t = stencil.symbol_table[ref.name]
        dtype = t.np_dtype if t is not None else None
      return _xp.sym('%s[%s]' % (_py_name(ref.name), _slice_str(slices)),
                     dtype)

    def param(name, idx):
      return xp.sym('%s[%s]' % (_py_name(name), ', '.join(map(str, idx))),
                    stencil.symbol_table[name].np_dtype)

    # the pure-NumPy target is the printed analog of the ORACLE: it
    # keeps plain C division so it can differentially check the jax
    # target's fast paths (CLAUDE.md architecture invariant)
    evaluator = semantics.Evaluator(xp, load, param=param,
                                    fast_int_div=(target == 'jax'))
    value, _ = evaluator.eval_stmt(stage.tensor)
    value = semantics.wrap(xp, value, stage.dtype)
    pads = ', '.join(
        '(%d, %d)' % (lo[dim - 1 - a], hi[dim - 1 - a]) for a in range(dim))
    w('\n  # %s: %s = %s\n' % (stage.name, stage.tensor.st_ref,
                               stage.tensor.expr))
    for line in xp.lines:
      w('  %s\n' % line)
    if any(l or h for l, h in zip(lo, hi)):
      w('  %s = ' % _py_name(stage.name) + prefix +
        '.pad(%s, (%s))\n' % (value.name, pads))
    else:
      w('  %s = %s\n' % (_py_name(stage.name), value.name))

  w('\n  return {%s}\n\n\n' % ', '.join(
      "'%s': %s" % (n, _py_name(n)) for n in stencil.output_names))

  if target == 'jax':
    w('forward = jax.jit(compute)\n\n\n')
  else:
    w('forward = compute\n\n\n')

  # self-test main (the SODA_TEST_MAIN analog)
  w('def main():\n')
  w('  shape = %r\n' % (tuple(int(x) for x in shape),))
  w('  rng = np.random.default_rng(0)\n')
  for name in stencil.input_names:
    t = stencil.symbol_table[name]
    name = _py_name(name)
    if t.is_float:
      w('  %s = rng.random(shape).astype(np.%s)\n' % (name, t.np_dtype.name))
    else:
      w('  %s = sum(np.arange(s, dtype=np.int64).reshape(\n'
        '      [-1 if i == a else 1 for i in range(len(shape))])\n'
        '      for a, s in enumerate(shape))\n' % name)
      if t.needs_mask:
        # ap_int widths: wrap into the declared range like every
        # executor's input wrap (semantics.wrap)
        w('  %s = %s & %d\n' % (name, name, (1 << t.width_in_bits) - 1))
        if t.is_signed:
          sign = 1 << (t.width_in_bits - 1)
          w('  %s = (%s ^ %d) - %d\n' % (name, name, sign, sign))
      w('  %s = %s.astype(np.%s)\n' % (name, name, t.np_dtype.name))
  for stmt in stencil.param_stmts:
    if stmt.dtype.is_float:
      w('  %s = rng.random(%r).astype(np.%s)\n' %
        (_py_name(stmt.name), tuple(stmt.size), stmt.dtype.np_dtype.name))
    else:
      # integer params as ramps (uniform [0,1) floats truncate to 0);
      # mirrors reference-style deterministic test params
      w('  %s = (np.arange(np.prod(%r)).reshape(%r) %% 7 + 1)'
        '.astype(np.%s)\n' %
        (_py_name(stmt.name), tuple(stmt.size), tuple(stmt.size),
         stmt.dtype.np_dtype.name))
  w('  outs = forward(%s)\n' % in_args)
  w('  for name, arr in outs.items():\n')
  if target == 'jax':
    w("    print(name, 'checksum',"
      ' float(jnp.sum(arr.astype(jnp.float64 '
      "if jnp.array(0.).dtype == jnp.float64 else jnp.float32))))\n")
  else:
    w("    print(name, 'checksum', float(np.sum("
      'arr.astype(np.float64))))\n')
  w('\n\nif __name__ == "__main__":\n  main()\n')


def generate(stencil, shape=None, target: str = 'jax') -> str:
  buf = io.StringIO()
  print_code(stencil, buf, shape, target)
  return buf.getvalue()
