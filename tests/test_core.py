"""Stencil-core tests.

Mirrors the reference's src/tests/test_core.py contracts: iterate
validation errors, high-level DAG construction with _iterN clones, plus
reuse-distance / stencil-window invariants the README documents
(2-line buffer for a 3x3 on a 2000-wide tile).
"""

import pytest

from soda_tpu.api import build_stencil
from soda_tpu.utils import SemanticError

BLUR = '''
kernel: blur
burst width: 512
unroll factor: 16
input uint16: input(2000, *)
local uint16: tmp(0,0)=(input(-1,0)+input(0,0)+input(1,0))/3
output uint16: output(0,0)=(tmp(0,-1)+tmp(0,0)+tmp(0,1))/3
iterate: 2
border: preserve
cluster: none
'''


def test_high_level_dag_construction():
  stencil = build_stencil(BLUR)
  tensors = ('input', 'tmp', 'input_iter1', 'tmp_iter1', 'output')
  assert sorted(stencil.tensors) == sorted(tensors)
  assert tuple(t.name for t in stencil.chronological_tensors) == tensors


def test_iterate_requires_matching_counts():
  src = BLUR.replace(
      'input uint16: input(2000, *)',
      'input uint16: input(2000, *)\ninput uint16: input2(2000, *)')
  with pytest.raises(SemanticError) as exc:
    build_stencil(src)
  assert 'number of input tensors must be the same as output' in str(
      exc.value)


def test_iterate_requires_matching_types():
  src = BLUR.replace('input uint16: input(2000, *)',
                     'input half: input(2000, *)')
  with pytest.raises(SemanticError) as exc:
    build_stencil(src)
  assert 'same type(s) as output' in str(exc.value)


def test_iterate_must_be_positive():
  with pytest.raises(SemanticError):
    build_stencil(BLUR.replace('iterate: 2', 'iterate: 0'))


def test_stencil_window_and_distance():
  # 3x3 window on a 2000-wide tile needs a 2-line buffer:
  # distance = 2*2000 + 2 (README.md:155-156 in the reference)
  stencil = build_stencil(BLUR.replace('iterate: 2', 'iterate: 1'))
  from soda_tpu.core.stencil import window_extent
  assert window_extent(stencil.stencil_window) == [3, 3]
  assert stencil.stencil_distance == 2 * 2000 + 2


def test_iterated_window_grows():
  stencil = build_stencil(BLUR)
  from soda_tpu.core.stencil import window_extent
  assert window_extent(stencil.stencil_window) == [5, 5]


def test_reuse_offsets_feasible():
  """Every load must target an already-produced, not-yet-consumed value."""
  stencil = build_stencil(BLUR)
  for st in stencil.tensors.values():
    for ld_name, offsets in st.ld_offsets.items():
      ld = stencil.tensors[ld_name]
      newest, oldest = max(offsets), min(offsets)
      assert ld.produce_offset <= st.produce_offset + (st.st_offset - newest)
      assert ld.consume_offset >= st.produce_offset + (st.st_offset - oldest)


def test_margins_and_halo_contract():
  """The window analytics must agree with the executed-margin contract:
  a 3x3 two-stage blur needs a 1-cell halo per side per sweep."""
  from soda_tpu.backend.plan import make_plan, materialized_margins
  stencil = build_stencil(BLUR.replace('iterate: 2', 'iterate: 1'))
  margins = materialized_margins(stencil)
  assert margins['input'] == ((0, 0), (0, 0))
  assert margins['tmp'] == ((1, 0), (1, 0))  # dim 0 only (row pass)
  assert margins['output'] == ((1, 1), (1, 1))
  plan = make_plan(stencil, 'full')
  assert plan.halo_lo == (1, 1) and plan.halo_hi == (1, 1)
  # two fused sweeps double the halo
  plan2 = make_plan(build_stencil(BLUR), 'full')
  assert plan2.halo_lo == (2, 2) and plan2.halo_hi == (2, 2)


def test_dram_override():
  stencil = build_stencil(BLUR, dram_in='1.2', dram_out='3')
  assert stencil.input_stmts[0].dram == (1, 2)
  assert stencil.output_stmts[0].dram == (3,)


def test_dram_override_named():
  stencil = build_stencil(BLUR, dram_in='input:0.1')
  assert stencil.input_stmts[0].dram == (0, 1)
  with pytest.raises(SemanticError):
    build_stencil(BLUR, dram_in='nope:0')


def test_tensor_name_shadowing_builtin_rejected():
  import pytest
  from soda_tpu import api, utils
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(64, *)
local float: min(0, 0) = x(0, 0) + 1.0f
output dram 1 float: o(0, 0) = min(0, 0)
"""
  with pytest.raises(utils.SemanticError):
    api.build_stencil(src)


def test_undefined_tensor_reference_rejected():
  import pytest
  from soda_tpu import api, utils
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: img(64, *)
output dram 1 float: o(0, 0) = imgg(0, 0) + 1.0f
"""
  st = api.build_stencil(src)
  with pytest.raises(utils.SemanticError):
    st.tensors  # noqa: B018 - building the DAG surfaces the error


def test_constant_output_pipeline():
  """Outputs reading no input (constant / param-only) must build,
  emit, and execute (stencil_distance 0, degenerate window)."""
  import io
  import numpy as np
  from soda_tpu import api
  from soda_tpu.backend import reference
  from soda_tpu.codegen import jax_source
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(64, *)
output dram 1 float: o(0, 0) = 1.5f
"""
  st = api.build_stencil(src)
  assert st.stencil_distance == 0
  jax_source.print_code(st, io.StringIO(), shape=(16, 64))
  out = reference.run(st, reference.make_test_inputs(st, (16, 64)))
  assert float(np.asarray(out['o'])[0, 0]) == 1.5


def test_parenthesized_assoc_chains_simplify_cleanly():
  """Nested &/^/| chains in operand[0] must not corrupt the operator
  tuple (code-review regression: a literal None leaked in)."""
  import numpy as np
  from soda_tpu import api
  from soda_tpu.backend import reference
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 uint16: a(64, *)
output dram 1 uint16: o(0, 0) = (a(0, 0) & a(0, 1)) & a(1, 0)
"""
  st = api.build_stencil(src)
  assert 'None' not in str(st.output_stmts[0])
  ins = reference.make_test_inputs(st, (16, 64))
  x = np.asarray(ins['a'])
  got = np.asarray(reference.run(st, ins)['o'])
  region = reference.output_valid_slices(st, (16, 64), 'o')
  want = x[:-1, :-1] & x[:-1, 1:] & x[1:, :-1]
  np.testing.assert_array_equal(got[region], want)
