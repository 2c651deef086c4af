"""Codegen backend tests: emitted standalone JAX modules must match the
oracle numerically (the analog of compiling + running the generated C++
in tests/test-cpp-host.sh)."""

import types

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.codegen import jax_source

from checks import assert_close_reference


def exec_generated(stencil, shape):
  src = jax_source.generate(stencil, shape)
  module = types.ModuleType('generated_stencil')
  exec(compile(src, '<generated>', 'exec'), module.__dict__)
  return src, module


@pytest.mark.parametrize('name',
                         ['blur', 'jacobi2d', 'sobel2d', 'erosion',
                          'xcorr', 'heat3d', 'denoise2d'])
def test_generated_module_matches_oracle(name):
  stencil = corpus.build(name)
  shape = corpus.TEST_DIMS[name]
  src, module = exec_generated(stencil, shape)
  assert 'import jax' in src and 'soda_tpu' not in src  # standalone
  inputs = reference.make_test_inputs(stencil, shape)
  params = reference.make_test_params(stencil)
  want = reference.run(stencil, inputs, params)
  args = [inputs[n] for n in stencil.input_names]
  args += [params[n] for n in stencil.param_names]
  got = module.compute(*args)
  for out_name in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out_name)
    assert_close_reference(
        np.asarray(got[out_name])[region], want[out_name][region],
        stencil.symbol_table[out_name].is_float, f'{name}:{out_name}')


def test_generated_main_runs(capsys):
  stencil = corpus.build('blur')
  _, module = exec_generated(stencil, (24, 64))
  module.main()
  out = capsys.readouterr().out
  assert 'blur_y checksum' in out


def test_header_contains_dsl():
  stencil = corpus.build('jacobi2d')
  src = jax_source.generate(stencil, (24, 32))
  assert 'kernel: jacobi2d' in src
  assert 'stencil distance' in src


def test_emitted_numpy_target_keeps_plain_c_division():
  """The printed NumPy program is the ORACLE analog: it must not bake
  in the fast-path division rewrites it exists to check."""
  import io
  from soda_tpu import api
  from soda_tpu.codegen import jax_source
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 int32: x(128, *)
output dram 1 int32: y(0, 0) = (x(0, 0) + x(0, 1)) / 256
"""
  st = api.build_stencil(src)
  buf_np, buf_jax = io.StringIO(), io.StringIO()
  jax_source.print_code(st, buf_np, shape=(16, 128), target='numpy')
  jax_source.print_code(st, buf_jax, shape=(16, 128), target='jax')
  assert 'right_shift' not in buf_np.getvalue()   # plain C division
  assert 'right_shift' in buf_jax.getvalue()       # fast path
