"""Moving-least-squares gradient weights.

Reference: ``src/utils/maths.py:23-240`` computes per-cell (or per-face) MLS
gradient weights with a Python loop over small numpy LSQ solves. Here the whole
mesh is one ``vmap``'d batch of tiny SPD solves — orders of magnitude faster and
jittable, with identical numerics (inverse-squared-distance weighting, 1e-10
Tikhonov regularization, gradient-of-basis-at-origin extraction).

The weights reproduce exact gradients of polynomials up to ``poly_order`` at
each stencil center, which is the unit-test contract (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_fluid_dynamics_tpu.ops.geometry import knn


def num_polynomial_terms(poly_order: int) -> int:
    return ((poly_order + 1) * (poly_order + 2)) // 2


def polynomial_basis(rel_pos: jax.Array, poly_order: int) -> jax.Array:
    """Monomial basis [1, x, y, x^2, xy, y^2, ...] up to ``poly_order``
    in the reference's column order (``maths.py:164-240``).

    rel_pos: (K, 2) -> (K, num_terms).
    """
    x, y = rel_pos[:, 0], rel_pos[:, 1]
    cols = []
    for order in range(poly_order + 1):
        for j in range(order + 1):  # x^(order-j) * y^j
            cols.append(x ** (order - j) * y ** j)
    return jnp.stack(cols, axis=1)


def _polynomial_basis_np(rel_pos: np.ndarray, poly_order: int) -> np.ndarray:
    """Batched monomial basis. rel_pos: (N, K, 2) -> (N, K, T)."""
    x, y = rel_pos[..., 0], rel_pos[..., 1]
    cols = []
    for order in range(poly_order + 1):
        for j in range(order + 1):  # x^(order-j) * y^j
            cols.append(x ** (order - j) * y ** j)
    return np.stack(cols, axis=-1)


def compute_mls_weights(pos: np.ndarray, poly_order: int,
                        mask: np.ndarray = None) -> Tuple[np.ndarray, np.ndarray]:
    """Compute (neighbours (N, K), weights (N, K, 2)) for all stencil centers.

    K = 2 * num_terms, matching the reference (``maths.py:57-58``). Offline
    preprocessing path: vectorized numpy float64 batch solves replace the
    reference's per-cell Python loop (``maths.py:115-160``), with identical
    numerics (inverse-squared-distance weighting, 1e-10 Tikhonov).
    """
    n_terms = num_polynomial_terms(poly_order)
    k = 2 * n_terms
    neighbours, distances = knn(pos, k, mask=mask)
    pos64 = np.asarray(pos, np.float64)
    rel = pos64[neighbours] - pos64[:, None, :]        # (N, K, 2)

    w = 1.0 / (distances + 1e-10) ** 2
    w = w / np.sum(w, axis=1, keepdims=True)           # (N, K)
    P = _polynomial_basis_np(rel, poly_order)          # (N, K, T)
    PW = P * w[..., None]
    A = np.einsum("nkt,nks->nts", P, PW)               # (N, T, T)
    A += 1e-10 * np.eye(n_terms)[None]
    # gradient of the basis at the origin: d/dx -> term 1 (x), d/dy -> term 2 (y)
    grad_basis = np.zeros((n_terms, 2))
    grad_basis[1, 0] = 1.0
    grad_basis[2, 1] = 1.0
    X = np.linalg.solve(A, np.broadcast_to(grad_basis, (A.shape[0],) +
                                           grad_basis.shape))  # (N, T, 2)
    weights = np.einsum("nkt,ntd->nkd", PW, X)         # (N, K, 2)
    return neighbours, weights.astype(np.float32)
