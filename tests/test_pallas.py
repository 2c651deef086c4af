"""Fused Pallas kernel vs NumPy oracle parity (interpret mode on CPU).

The Pallas path is the analog of the reference's full hardware kernel;
this is its software correctness gate (same role as
tests/test-cpp-host.sh running the HLS kernel as plain C++).
"""

import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend import reference
from soda_tpu.backend.pallas_kernel import PallasExecutor

from checks import assert_close_reference


def check_kernel(name, shape=None, block_rows=None, **ex_kwargs):
  stencil = corpus.build(name)
  shape = shape or corpus.TEST_DIMS[name]
  inputs = reference.make_test_inputs(stencil, shape)
  params = reference.make_test_params(stencil)
  want = reference.run(stencil, inputs, params)
  executor = PallasExecutor(stencil, shape, block_rows=block_rows,
                            **ex_kwargs)
  got = executor(inputs, params)
  for out_name in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out_name)
    assert_close_reference(
        np.asarray(got[out_name])[region], want[out_name][region],
        stencil.symbol_table[out_name].is_float, f'{name}:{out_name}')


@pytest.mark.parametrize('mode', ['value', 'vmem'])
@pytest.mark.parametrize('name', sorted(corpus.CORPUS))
def test_corpus_pallas_matches_oracle(name, mode):
  check_kernel(name, stage_mode=mode)


def test_multi_block_grid():
  # force several grid steps incl. a ragged tail block
  check_kernel('blur', shape=(70, 64), block_rows=16)


def test_single_block_tiny_grid():
  check_kernel('jacobi2d', shape=(12, 32))


def test_blocked_3d():
  check_kernel('heat3d', shape=(40, 32, 32), block_rows=8)


def test_deep_iterate_pipeline():
  # four fused sweeps: halo 4 each way, one HBM pass
  stencil = corpus.build('jacobi2d', iterate=4)
  assert len(stencil.chronological_tensors) == 5
  check_kernel('jacobi2d', shape=(40, 32))
  shape = (40, 32)
  st = corpus.build('jacobi2d', iterate=4)
  inputs = reference.make_test_inputs(st, shape)
  want = reference.run(st, inputs)
  got = PallasExecutor(st, shape)(inputs)
  region = reference.output_valid_slices(st, shape)
  assert region[0].start == 4  # accumulated halo
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True, 'iterate4')


@pytest.mark.parametrize('grid_blocks', [3, 4, 5])
def test_rolling_fill_boundary_classes(grid_blocks):
  """3-D rolling slab fill: the first window's clamped start skews the
  second and tail overlaps — exercise every class at several grid
  sizes (halo 2 each way: iterate-2 jacobi3d)."""
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  stencil = corpus.build('jacobi3d')
  b = 8
  shape = (b * grid_blocks, 16, 128)
  ex = PallasExecutor(stencil, shape, block_rows=b)
  assert ex.grid == grid_blocks
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True,
                         'rolling:%d' % grid_blocks)


def test_rolling_with_mid_blocking():
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('heat3d')
  shape = (48, 64, 128)
  ex = MidTiledPallasExecutor(stencil, shape, mid_tile=16,
                              block_rows=8)
  assert ex.grid_m > 1 and ex.grid >= 3
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['out'])[region],
                         want['out'][region], True, 'rolling:mid')


@pytest.mark.parametrize('chunk', [4, 8])
def test_compute_chunked_3d(chunk):
  """compute_chunk evaluates stage regions in axis-0 sub-chunks (the
  VMEM-pressure escape hatch for wide 3-D cross-sections); childless
  outputs store each chunk straight into the output block."""
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  stencil = corpus.build('jacobi3d')
  shape = (48, 16, 128)
  ex = PallasExecutor(stencil, shape, block_rows=8, compute_chunk=chunk)
  assert ex.stage_mode == 'vmem'
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True, 'chunk:%d' % chunk)


def test_compute_chunked_with_mid_blocking():
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('heat3d')
  shape = (48, 64, 128)
  ex = MidTiledPallasExecutor(stencil, shape, mid_tile=16, block_rows=8,
                              compute_chunk=4)
  assert ex.grid_m > 1
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['out'])[region],
                         want['out'][region], True, 'chunk:mid')


@pytest.mark.parametrize('stream_loop', [True, 'peel'])
def test_compute_chunked_stream_loop(stream_loop):
  """Chunked stage evaluation (windowed store_all_classes) under the
  in-kernel streaming loop: the chunk windows must compose with the
  statically-pruned store classes of the steady/peeled bodies."""
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  stencil = corpus.build('jacobi3d')
  shape = (48, 64, 128)
  ex = MidTiledPallasExecutor(stencil, shape, mid_tile=16, block_rows=8,
                              compute_chunk=4, stream_loop=stream_loop)
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  region = reference.output_valid_slices(stencil, shape)
  assert_close_reference(np.asarray(got['t0'])[region],
                         want['t0'][region], True,
                         'chunk:loop:%s' % stream_loop)


def test_compute_chunked_rejects_2d():
  from soda_tpu import utils
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  stencil = corpus.build('blur')
  with pytest.raises(utils.InputError):
    PallasExecutor(stencil, (64, 128), compute_chunk=8)


def test_compute_chunk_validation():
  from soda_tpu import utils
  from soda_tpu.backend.pallas_kernel import PallasExecutor
  stencil = corpus.build('jacobi3d')
  for bad in (0, -8, 'x'):
    with pytest.raises(utils.InputError):
      PallasExecutor(stencil, (48, 16, 128), block_rows=8,
                     compute_chunk=bad)


def test_scratch_slots_freed_through_skipped_outputs():
  # a skipped (direct-store) output must still release its parents'
  # slabs for reuse by later same-dtype stages
  from soda_tpu.backend.pallas_kernel import scratch_slots
  from soda_tpu.backend.plan import make_plan
  from soda_tpu import api
  st = api.build_stencil("""
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(128, 16, *)
local float: a(0, 0, 0) = x(0, 0, 0) + x(0, 0, 1)
output dram 1 float: y(0, 0, 0) = a(0, 0, 0) + a(0, 0, 1)
local float: b(0, 0, 0) = x(0, 1, 0) + x(1, 0, 0)
output dram 2 float: z(0, 0, 0) = b(0, 0, 0) + b(0, 1, 0)
""")
  plan = make_plan(st, 'full')
  # force the order where the skipped output is the freeing point
  by_name = {s.name: s for s in plan.stages}
  plan.stages = [by_name[n] for n in ('a', 'y', 'b', 'z')]
  slot_of, slot_dtypes = scratch_slots(plan, skip={'y', 'z'})
  # with y/z skipped, b must reuse a's slab (a dies at y)
  assert len(slot_dtypes) == 1
  assert slot_of['a'] == slot_of['b']


@pytest.mark.parametrize('name', ['erosion', 'xcorr', 'sobel2d'])
def test_transposed_lane_regions_match_oracle(name):
  """Slice-mode lane-only stage chains evaluate in transposed layout
  (lane shifts become sublane slices); bit-exact vs the oracle,
  including the conditional store classes (the un-transpose must
  happen outside pl.when — regression for the captured-constant bug)."""
  stencil = corpus.build(name, tile_size=(256, 0),
                         optimizations={'computation-reuse': 'greedy'})
  shape = (96, 256)  # 3 stream blocks at b=32: first/mid/tail classes
  ex = PallasExecutor(stencil, shape, lane_shift='slice', block_rows=32)
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(np.asarray(got[out])[region],
                           want[out][region],
                           stencil.symbol_table[out].is_float,
                           'transposed:%s' % name)


def test_transpose_lanes_off_disables_regions():
  """transpose_lanes='off' must be a real escape hatch (code-review
  regression: the gate ignored it); every mode stays bit-exact."""
  stencil = corpus.build('erosion', tile_size=(256, 0),
                         optimizations={'computation-reuse': 'greedy'})
  shape = (64, 256)
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  region = reference.output_valid_slices(stencil, shape, 'output')
  for mode in ('off', 'auto', 'on'):
    ex = PallasExecutor(stencil, shape, lane_shift='slice',
                        transpose_lanes=mode)
    got = ex(inputs)
    np.testing.assert_array_equal(np.asarray(got['output'])[region],
                                  np.asarray(want['output'])[region])


def test_missing_param_raises_input_error():
  from soda_tpu import api, utils
  src = """
kernel: t
burst width: 64
unroll factor: 1
iterate: 1
border: ignore
cluster: none
input dram 0 float: x(128, *)
param float: k
output dram 1 float: y(0, 0) = x(0, 0) * k[0]
"""
  try:
    st = api.build_stencil(src)
  except Exception:
    pytest.skip('param syntax variant unsupported in this form')
  ex = PallasExecutor(st, (16, 128))
  inputs = reference.make_test_inputs(st, (16, 128))
  with pytest.raises(utils.InputError):
    ex(inputs, params={})


@pytest.mark.parametrize('name,shape,builder_kw', [
    ('jacobi3d', (64, 64, 64), {'mid_tile': 32, 'block_rows': 16}),
    ('blur', (128, 64), {'block_rows': 32}),
    ('heat3d', (64, 32, 64), {'block_rows': 16}),
    ('erosion', (256, 64), {'block_rows': 64}),
])
def test_out_dma_matches_oracle(name, shape, builder_kw):
  """Manual output DMA (staging + async copies, bypassing the Pallas
  output-block pipeline) is semantics-preserving on every store path:
  3-D mid-blocked, plain 2-D/3-D, value mode."""
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  tiles = {'jacobi3d': (64, 32, 0), 'blur': (64, 0),
           'heat3d': (64, 32, 0), 'erosion': (64, 0)}
  stencil = corpus.build(name, tile_size=tiles[name])
  cls = MidTiledPallasExecutor if 'mid_tile' in builder_kw \
      else PallasExecutor
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  ex = cls(stencil, shape, out_dma=True, **builder_kw)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(
        np.asarray(got[out])[region], want[out][region],
        stencil.symbol_table[out].is_float, f'{name}:out_dma')


@pytest.mark.parametrize('stream_loop', [True, 'peel'])
@pytest.mark.parametrize('name,shape,builder_kw', [
    ('jacobi3d', (64, 64, 64), {'mid_tile': 32, 'block_rows': 16}),
    # grid_m=4 <= the peel mid-unroll bound: exercises STATIC jm with
    # a 'mid' mid-class present (first/mid/tail all fold at trace time)
    ('jacobi3d', (64, 64, 64), {'mid_tile': 16, 'block_rows': 16}),
    # grid_m=6 > the peel mid-unroll bound: jm stays a fori_loop
    # variable while the peeled stream steps keep static i — the
    # mixed dynamic-jm/static-i predicates must still fold correctly
    ('jacobi3d', (64, 96, 64), {'mid_tile': 16, 'block_rows': 16}),
    ('blur', (128, 64), {'block_rows': 32}),
    ('heat3d', (64, 32, 64),
     {'block_rows': 16, 'stage_mode': 'value', 'shift_mode': 'roll'}),
    ('erosion', (256, 64),
     {'block_rows': 64, 'stage_mode': 'value', 'shift_mode': 'roll',
      'transpose_lanes': 'on'}),
    ('denoise2d', (64, 64), {'block_rows': 8, 'stage_mode': 'vmem'}),
])
def test_stream_loop_matches_oracle(name, shape, builder_kw, stream_loop):
  """stream_loop: the whole streaming grid runs inside ONE kernel
  invocation (empty Pallas grid, lax.fori_loop over steps, implied
  out_dma staging) — semantics-preserving on every step-body path:
  mid-blocked 3-D, plain 2-D, roll mode, and the transposed hybrid."""
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  tiles = {'jacobi3d': (64, 32, 0), 'blur': (64, 0),
           'heat3d': (64, 32, 0), 'erosion': (64, 0),
           'denoise2d': (64, 0)}
  stencil = corpus.build(name, tile_size=tiles[name])
  cls = MidTiledPallasExecutor if 'mid_tile' in builder_kw \
      else PallasExecutor
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  ex = cls(stencil, shape, stream_loop=stream_loop, **builder_kw)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(
        np.asarray(got[out])[region], want[out][region],
        stencil.symbol_table[out].is_float, f'{name}:stream_loop')


@pytest.mark.parametrize('prefetch', [2, 3, 4])
@pytest.mark.parametrize('name,shape,builder_kw', [
    ('blur', (128, 64), {'block_rows': 16}),
    ('jacobi3d', (64, 64, 64), {'mid_tile': 32, 'block_rows': 8}),
    ('jacobi3d', (96, 32, 64),
     {'block_rows': 16, 'stream_loop': 'peel'}),
    ('heat3d', (64, 32, 64),
     {'block_rows': 8, 'stage_mode': 'value', 'shift_mode': 'roll',
      'stream_loop': True}),
])
def test_prefetch_depth_matches_oracle(name, shape, builder_kw, prefetch):
  """prefetch > 2: input-slab fills start depth-1 steps ahead (and the
  rolling fill is disabled). Covers grid mode, mid-blocked grids (the
  warm-up crossing a tile boundary at block_rows=8, grid=8 <= la is
  impossible, but la=3 exercises the wrap arithmetic), stream_loop and
  peel bodies."""
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  tiles = {'blur': (64, 0), 'jacobi3d': (64, 32, 0),
           'heat3d': (64, 32, 0)}
  stencil = corpus.build(name, tile_size=tiles[name])
  cls = MidTiledPallasExecutor if 'mid_tile' in builder_kw \
      else PallasExecutor
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  ex = cls(stencil, shape, prefetch=prefetch, **builder_kw)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(
        np.asarray(got[out])[region], want[out][region],
        stencil.symbol_table[out].is_float, f'{name}:prefetch{prefetch}')


@pytest.mark.parametrize('name,ov', [
    ('erosion', {'optimizations': {'computation-reuse': 'greedy'}}),
    ('xcorr', {'optimizations': {'computation-reuse': 'greedy'}}),
    ('jacobi2d', {}),
    ('sobel2d', {}),
    ('blur', {}),
    ('heat3d', {}),
    ('denoise2d', {}),
])
def test_roll_shift_mode_matches_oracle(name, ov):
  """shift_mode='roll': every shifted load rotates a full-slab-extent
  value; wrap garbage must stay confined to the margin cells the
  validity analysis excludes (store windows clip them)."""
  shapes = {'heat3d': (64, 32, 64)}
  tiles = {'heat3d': (64, 32, 0)}
  shape = shapes.get(name, (256, 128))
  stencil = corpus.build(name, tile_size=tiles.get(name, (128, 0)), **ov)
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  ex = PallasExecutor(stencil, shape, stage_mode='value',
                      shift_mode='roll', block_rows=32)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(
        np.asarray(got[out])[region], want[out][region],
        stencil.symbol_table[out].is_float, f'{name}:roll')


def test_roll_shifted_load_cse():
  """Roll-mode duplicate-load accounting (exp46): denoise2d's output
  stage re-reads u at all 4 diff-stage offsets. The Python-level memo
  that would dedup them is measured REFUTED as a default (Mosaic CSEs
  the duplicates itself; the memo's longer live ranges cost -23% on
  denoise3d peel+b16), so production traces with _ROLL_CSE off and
  this test pins (a) the duplication tally the model's global dedup
  relies on and (b) bit-exactness with the memo forced ON."""
  from soda_tpu.backend import pallas_kernel as pk

  def run(name, shape):
    stencil = corpus.build(name)
    inputs = reference.make_test_inputs(stencil, shape)
    pk._ROLL_STATS.update(computed=0, reused=0)
    ex = PallasExecutor(stencil, shape, stage_mode='value',
                        shift_mode='roll', block_rows=32)
    got = ex(inputs)  # jit is lazy; tracing (and the tally) happen here
    return got, dict(pk._ROLL_STATS)

  base, s = run('denoise2d', (64, 128))
  # 4 distinct u offsets re-read by the output stage, per store class
  assert s['reused'] >= 4, s
  _, s = run('jacobi2d', (64, 128))
  assert s['reused'] == 0, s

  assert pk._ROLL_CSE is False  # exp46: refuted default
  try:
    pk._ROLL_CSE = True
    memo, _ = run('denoise2d', (64, 128))
    np.testing.assert_array_equal(np.asarray(memo['output']),
                                  np.asarray(base['output']))
  finally:
    pk._ROLL_CSE = False


def test_roll_shift_requires_value_mode():
  stencil = corpus.build('blur', tile_size=(128, 0))
  with pytest.raises(Exception, match='shift_mode=roll'):
    PallasExecutor(stencil, (256, 128), stage_mode='vmem',
                   shift_mode='roll')


@pytest.mark.parametrize('dma_split', [2, 3])
@pytest.mark.parametrize('name,shape,builder_kw', [
    # rolling fill (partial_copy sub-DMAs) + plain grid (in_copy)
    ('jacobi3d', (64, 64, 64), {'mid_tile': 32, 'block_rows': 8}),
    # peel body: boundary steps carry static sub-range offsets
    ('jacobi3d', (96, 32, 64),
     {'block_rows': 8, 'stage_mode': 'value', 'shift_mode': 'roll',
      'stream_loop': 'peel'}),
    # prefetch>2 disables rolling: split applies to full-slab in_copy;
    # block_rows=3 < split exercises the clamp to one-row chunks
    ('heat3d', (64, 32, 64), {'block_rows': 3, 'prefetch': 3}),
])
def test_dma_split_matches_oracle(name, shape, builder_kw, dma_split):
  """dma_split: each input-slab fill issued as several back-to-back
  sub-DMAs on one semaphore slot (exp30: grant overlap, +7% on the
  pure-DMA replay). Ragged chunking (rows not divisible) covered by
  block_rows=8 split 3."""
  from soda_tpu.backend.pallas_kernel import MidTiledPallasExecutor
  tiles = {'jacobi3d': (64, 32, 0), 'heat3d': (64, 32, 0)}
  stencil = corpus.build(name, tile_size=tiles[name])
  cls = MidTiledPallasExecutor if 'mid_tile' in builder_kw \
      else PallasExecutor
  inputs = reference.make_test_inputs(stencil, shape)
  want = reference.run(stencil, inputs)
  ex = cls(stencil, shape, dma_split=dma_split, **builder_kw)
  got = ex(inputs)
  for out in stencil.output_names:
    region = reference.output_valid_slices(stencil, shape, out)
    assert_close_reference(
        np.asarray(got[out])[region], want[out][region],
        stencil.symbol_table[out].is_float, f'{name}:split{dma_split}')


def test_dma_split_requires_3d():
  stencil = corpus.build('blur', tile_size=(128, 0))
  with pytest.raises(ValueError, match='dma_split'):
    PallasExecutor(stencil, (256, 128), dma_split=2)
