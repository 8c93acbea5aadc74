"""MLS gradient-weight tests: the weights must reproduce exact gradients of
polynomials up to the stencil order (SURVEY.md §4 contract; reference
``src/utils/maths.py:109-162``)."""

import numpy as np
import pytest

from gnn_fluid_dynamics_tpu.ops import fvm
from gnn_fluid_dynamics_tpu.ops.mls import (compute_mls_weights,
                                            num_polynomial_terms)


def test_num_terms():
    assert num_polynomial_terms(1) == 3
    assert num_polynomial_terms(2) == 6
    assert num_polynomial_terms(3) == 10


@pytest.mark.parametrize("poly_order", [1, 2])
def test_exact_polynomial_gradient(poly_order):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, size=(200, 2))
    neighbours, weights = compute_mls_weights(pos, poly_order)

    # linear field: f = 2x - 3y + 1 -> grad (2, -3) everywhere
    f = 2 * pos[:, 0] - 3 * pos[:, 1] + 1.0
    diff = f[neighbours] - f[:, None]
    gx = np.sum(weights[:, :, 0] * diff, axis=1)
    gy = np.sum(weights[:, :, 1] * diff, axis=1)
    np.testing.assert_allclose(gx, 2.0, atol=1e-3)
    np.testing.assert_allclose(gy, -3.0, atol=1e-3)

    if poly_order >= 2:
        # quadratic: f = x^2 + x y -> grad = (2x + y, x)
        f = pos[:, 0] ** 2 + pos[:, 0] * pos[:, 1]
        diff = f[neighbours] - f[:, None]
        gx = np.sum(weights[:, :, 0] * diff, axis=1)
        gy = np.sum(weights[:, :, 1] * diff, axis=1)
        np.testing.assert_allclose(gx, 2 * pos[:, 0] + pos[:, 1], atol=5e-3)
        np.testing.assert_allclose(gy, pos[:, 0], atol=5e-3)


def test_divergence_from_uc_linear_field(small_geom):
    """div(u) for u = (x, -y) is exactly 0; for u = (x, y) it's 2·V per cell."""
    import jax.numpy as jnp
    pos = small_geom["cell_pos"]
    neighbours, weights = compute_mls_weights(pos, 1)
    vol = jnp.asarray(small_geom["cell_volume"])

    u = jnp.asarray(np.stack([pos[:, 0], -pos[:, 1]], 1).astype(np.float32))
    div = fvm.divergence_from_uc(u, jnp.asarray(weights),
                                 jnp.asarray(neighbours), vol)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-4)

    u2 = jnp.asarray(pos.astype(np.float32))
    div2 = fvm.divergence_from_uc(u2, jnp.asarray(weights),
                                  jnp.asarray(neighbours), vol)
    np.testing.assert_allclose(np.asarray(div2), 2.0 * np.asarray(vol),
                               atol=1e-4)


def test_gradient_tensor_pairing():
    """calc_gradient_tensor keeps the reference's exact component pairing
    (geometry.py:527-530): [sum wx·dvx, sum wy·dvy, sum wx·dvy, sum wy·dvx]."""
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 1, size=(150, 2))
    neighbours, weights = compute_mls_weights(pos, 1)
    # v = (3x, 5y): gxx=3 (wx·dvx), gxy=5 (wy·dvy), gyx (wx·dvy)=0, gyy (wy·dvx)=0
    v = np.stack([3 * pos[:, 0], 5 * pos[:, 1]], 1).astype(np.float32)
    g = fvm.calc_gradient_tensor(jnp.asarray(v), jnp.asarray(weights),
                                 jnp.asarray(neighbours))
    g = np.asarray(g)
    np.testing.assert_allclose(g[:, 0], 3.0, atol=1e-3)
    np.testing.assert_allclose(g[:, 1], 5.0, atol=1e-3)
    np.testing.assert_allclose(g[:, 2], 0.0, atol=1e-3)
    np.testing.assert_allclose(g[:, 3], 0.0, atol=1e-3)
