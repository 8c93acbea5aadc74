"""Unit tests for the FVM numerics kernels against analytic fields.

Spec source: reference ``src/utils/fvm.py`` semantics + the physics invariants
(divergence of an exact incompressible field ~ 0; flux sign consistency via the
±1 dummy pattern, ``fvm.py:158-206``)."""

import jax.numpy as jnp
import numpy as np

from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   taylor_green_trajectory,
                                                   taylor_green_velocity)
from gnn_fluid_dynamics_tpu.ops import fvm


def test_chain_flux_dot_product():
    a = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    b = jnp.asarray(np.ones((3, 2), np.float32))
    out = fvm.chain_flux_dot_product(a, b)
    np.testing.assert_allclose(out, np.array([[1, 5], [9, 13], [17, 21]]))


def test_divergence_from_face_flux_incompressible(small_geom):
    fields = taylor_green_trajectory(small_geom, num_timesteps=1)
    flux = jnp.asarray(fields["face_flux"][0])
    div = fvm.divergence_from_face_flux(flux,
                                        jnp.asarray(small_geom["face_index"]))
    # owner-oriented flux summed without signs is NOT a true divergence; this
    # is the loss form used by reference FluxB (fvm.py:4-10). Shape check only.
    assert div.shape == (small_geom["cell_pos"].shape[0], 1)


def test_face_flux_to_cell_flux_divergence(small_geom):
    """Signed per-cell flux of the exact TG field must sum to ~0 per cell
    (discrete divergence of an exact incompressible field)."""
    fields = taylor_green_trajectory(small_geom, num_timesteps=1)
    flux = jnp.asarray(fields["face_flux"][0])
    cell_flux = fvm.face_flux_to_cell_flux(
        flux, jnp.asarray(small_geom["face_index"]),
        jnp.asarray(small_geom["cell_face_sign"]))
    div = fvm.divergence_from_cell_flux(cell_flux[..., 0])
    h = float(np.sqrt(small_geom["cell_volume"].mean()))
    # second-order midpoint quadrature: O(h^3) per cell-face
    assert float(jnp.abs(div).max()) < 5 * h ** 3


def test_divergence_from_uf_incompressible(small_geom):
    fields = taylor_green_trajectory(small_geom, num_timesteps=1)
    uf = jnp.asarray(fields["face_velocity"][0])
    div = fvm.divergence_from_uf(
        uf, jnp.asarray(small_geom["cell_normal"]),
        jnp.asarray(small_geom["face_area"]),
        jnp.asarray(small_geom["face_index"]))
    h = float(np.sqrt(small_geom["cell_volume"].mean()))
    assert float(jnp.abs(div).max()) < 5 * h ** 3


def test_divergence_uniform_field_exact(small_geom):
    """A constant velocity field has exactly zero discrete divergence (surface
    closure identity)."""
    F = small_geom["face_pos"].shape[0]
    uf = jnp.asarray(np.tile([1.7, -0.3], (F, 1)).astype(np.float32))
    div = fvm.divergence_from_uf(
        uf, jnp.asarray(small_geom["cell_normal"]),
        jnp.asarray(small_geom["face_area"]),
        jnp.asarray(small_geom["face_index"]))
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-5)


def test_flux_roundtrip(small_geom):
    """face flux -> cell flux -> face flux must be the identity (owner path)."""
    F = small_geom["face_pos"].shape[0]
    rng = np.random.default_rng(1)
    flux = jnp.asarray(rng.normal(size=(F, 1)).astype(np.float32))
    cell_flux = fvm.face_flux_to_cell_flux(
        flux, jnp.asarray(small_geom["face_index"]),
        jnp.asarray(small_geom["cell_face_sign"]))
    back = fvm.cell_flux_to_face_flux(
        cell_flux[..., 0], jnp.asarray(small_geom["cell_edge_index"]),
        jnp.asarray(small_geom["owner_local_slot"]))
    np.testing.assert_allclose(np.asarray(back), np.asarray(flux), atol=1e-6)


def test_calc_flux_from_uf_matches_analytic(small_geom):
    fields = taylor_green_trajectory(small_geom, num_timesteps=1)
    uf = jnp.asarray(fields["face_velocity"][0])
    flux = fvm.calc_flux_from_uf(uf, jnp.asarray(small_geom["face_normal"]),
                                 jnp.asarray(small_geom["face_area"]))
    np.testing.assert_allclose(np.asarray(flux), fields["face_flux"][0],
                               atol=1e-5)


def test_dummy_sign_pattern(small_geom):
    """The ±1 dummy pattern: every interior face contributes +1 to its owner
    and -1 to its neighbour, so the global sum equals the boundary face count."""
    sign = small_geom["cell_face_sign"]
    boundary = small_geom["face_boundary_mask"]
    assert float(sign.sum()) == float(boundary.sum())
