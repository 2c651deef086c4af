"""Utility tests: serialization round-trip (reference test_util.py) and
toposort behavior."""

import pytest

from soda_tpu import utils


def test_serialize_deserialize_round_trip():
  tile_size = (233, 233, 233, 0)
  idx = (23, 23, 23, 233)
  offset = 23 + 23 * 233 + 23 * 233**2 + 233 * 233**3
  assert utils.serialize(idx, tile_size) == offset
  assert utils.deserialize(offset, tile_size) == idx


def test_serialize_dim0_is_fastest():
  assert utils.serialize((1, 0), (100, 0)) == 1
  assert utils.serialize((0, 1), (100, 0)) == 100


def test_toposort_flatten():
  graph = {'c': {'a', 'b'}, 'b': {'a'}, 'a': set()}
  order = utils.toposort_flatten(graph)
  assert order.index('a') < order.index('b') < order.index('c')


def test_toposort_detects_cycle():
  with pytest.raises(ValueError):
    utils.toposort_flatten({'a': {'b'}, 'b': {'a'}})


def test_toposort_insertion_order():
  graph = {'z': set(), 'y': set(), 'x': {'z'}}
  assert utils.toposort_flatten(graph, sort=False) == ['z', 'y', 'x']


def test_device_reachable_times_out_cleanly(monkeypatch):
  """A hung tunnel must yield False within the bound, never an
  exception (the in-thread probe poisons jax's backend-init lock on
  timeout, so the CLI pre-flight uses this subprocess probe)."""
  import subprocess

  def fake_run(*a, **k):
    raise subprocess.TimeoutExpired(cmd='probe', timeout=k['timeout'])

  monkeypatch.setattr(subprocess, 'run', fake_run)
  assert utils.device_reachable(timeout_s=0.1) is False


def test_device_reachable_true_on_success(monkeypatch):
  import subprocess
  import types

  monkeypatch.setattr(
      subprocess, 'run',
      lambda *a, **k: types.SimpleNamespace(returncode=0))
  assert utils.device_reachable(timeout_s=1.0) is True
