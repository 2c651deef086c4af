"""JAX functional-transform composability of the XLA executor path.

A stencil pipeline traced by XlaExecutor.fn is ordinary jnp
arithmetic, so float kernels compose with jax.grad / jax.vmap /
jax.jit — capabilities the reference's generated-FPGA flow cannot
offer at all (its closest analog is re-synthesizing a hand-written
adjoint kernel). These tests pin that contract so evaluator changes
cannot silently break transform tracing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soda_tpu import corpus
from soda_tpu.backend.xla import XlaExecutor


@pytest.fixture(scope='module')
def jacobi():
  st = corpus.build('jacobi2d')
  shape = (32, 24)
  return XlaExecutor(st, shape), shape


def test_grad_matches_finite_differences(jacobi):
  ex, shape = jacobi
  x = jnp.asarray(np.random.RandomState(0).rand(*shape).astype(np.float32))

  def loss(a):
    return jnp.sum(ex.fn(a)[0] ** 2)

  g = jax.grad(loss)(x)
  assert g.shape == shape
  # central difference at an interior cell (f32: loose tolerance)
  eps = 1e-2
  for cell in ((11, 11), (15, 7)):
    e = jnp.zeros_like(x).at[cell].set(eps)
    fd = (loss(x + e) - loss(x - e)) / (2 * eps)
    assert abs(float(fd) - float(g[cell])) <= 2e-2 * max(1.0, abs(float(fd)))


def test_grad_zero_outside_stencil_reach(jacobi):
  """d out[c] / d in[far] is zero beyond the (iterate-deep) window."""
  ex, shape = jacobi
  x = jnp.asarray(np.random.RandomState(1).rand(*shape).astype(np.float32))
  c = (16, 12)

  def probe(a):
    return ex.fn(a)[0][c]

  g = jax.grad(probe)(x)
  # jacobi2d iterate=2: 5-point window applied twice -> reach 2 per axis
  assert float(g[c[0] + 3, c[1]]) == 0.0
  assert float(g[c[0], c[1] + 3]) == 0.0
  assert float(g[c[0] + 1, c[1]]) != 0.0


def test_vmap_matches_python_loop(jacobi):
  ex, shape = jacobi
  rng = np.random.RandomState(2)
  batch = jnp.asarray(rng.rand(3, *shape).astype(np.float32))
  vout = jax.vmap(lambda a: ex.fn(a)[0])(batch)
  for k in range(3):
    np.testing.assert_allclose(np.asarray(vout[k]),
                               np.asarray(ex.fn(batch[k])[0]),
                               rtol=1e-6, atol=1e-6)


def test_grad_through_chained_steps():
  """grad composes with the device-side multi-step driver."""
  from soda_tpu import api
  st = corpus.build('jacobi2d')
  shape = (32, 24)
  ex = XlaExecutor(st, shape)
  step = api.chained(ex, 3)
  x = jnp.asarray(np.random.RandomState(3).rand(*shape).astype(np.float32))

  def loss(a):
    return jnp.sum(step(a)[0])

  g = jax.grad(loss)(x)
  assert g.shape == shape and bool(jnp.any(g != 0))
