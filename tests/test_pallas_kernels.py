"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.ops.pallas_kernels import cholesky_solve


def make_spd(rng, B, n, dtype=np.float32):
    A = rng.normal(size=(B, n, n)).astype(dtype)
    H = np.einsum("bij,bkj->bik", A, A) + n * np.eye(n, dtype=dtype)
    return H


@pytest.mark.parametrize("n", [128, 256, 384])
def test_cholesky_solve_matches_xla(rng, n):
    B = 3
    H = jnp.asarray(make_spd(rng, B, n), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    lam = jnp.asarray(np.full(B, 1e-4, np.float32))
    x = cholesky_solve(H, b, lam, interpret=True)
    # reference: damped solve via XLA
    dd = lam[:, None] * jnp.diagonal(H, axis1=1, axis2=2) + 1e-12
    Hd = H + jax.vmap(jnp.diag)(dd)
    want = jax.vmap(lambda A, bb: -jnp.linalg.solve(A, bb))(Hd, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_cholesky_solve_unaligned_n(rng):
    """n not a multiple of 128 exercises the padding path."""
    B, n = 2, 222
    H = jnp.asarray(make_spd(rng, B, n), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    x = cholesky_solve(H, b, 1e-4, interpret=True)
    dd = 1e-4 * jnp.diagonal(H, axis1=1, axis2=2) + 1e-12
    Hd = H + jax.vmap(jnp.diag)(dd)
    want = jax.vmap(lambda A, bb: -jnp.linalg.solve(A, bb))(Hd, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), rtol=2e-3,
                               atol=2e-3)
