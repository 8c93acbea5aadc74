"""Unit tests for the connectivity/geometry builder.

Contract: the invariants implied by the reference's builder
(``src/utils/geometry.py:64-170``) — face ordering, owner/neighbour
orientation, sign tables, normals — verified structurally (no torch)."""

import numpy as np
import pytest

from gnn_fluid_dynamics_tpu.data.node_types import NodeType
from gnn_fluid_dynamics_tpu.data.synthetic import (cylinder_channel_mesh,
                                                   structured_channel_mesh)
from gnn_fluid_dynamics_tpu.ops.connectivity import (
    build_geometry, compute_cell_face_sign, compute_connectivity,
    compute_owner_local_slot, reorder_face)


@pytest.fixture(scope="module", params=["structured", "cylinder"])
def mesh(request):
    if request.param == "structured":
        return structured_channel_mesh(nx=6, ny=4, jitter=0.2, seed=3)
    return cylinder_channel_mesh(n_points=300, seed=1)


def test_connectivity_shapes(mesh):
    pos, cells, _ = mesh
    face_index, cei, vei = compute_connectivity(cells, pos)
    C = cells.shape[0]
    F = vei.shape[1]
    assert face_index.shape == (3, C)
    assert cei.shape == (2, F)
    # Euler: V - E + C = 1 + holes for planar graphs; just sanity-bound F
    assert F > C

    # every face id appears in 1 (boundary) or 2 (interior) cells
    counts = np.bincount(face_index.reshape(-1), minlength=F)
    assert set(np.unique(counts)) <= {1, 2}
    boundary = cei[0] == cei[1]
    assert np.all(counts[boundary] == 1)
    assert np.all(counts[~boundary] == 2)


def test_face_ids_sorted_by_packed_edge(mesh):
    """Face ids must be assigned in lexicographic (max, min) vertex order —
    the triangles_to_faces contract that makes ids reproducible."""
    pos, cells, _ = mesh
    _, _, vei = compute_connectivity(cells, pos)
    packed = vei.T  # (F, 2) [sender=max, receiver=min]
    assert np.all(packed[:, 0] >= packed[:, 1])
    order = np.lexsort((packed[:, 1], packed[:, 0]))
    assert np.all(order == np.arange(packed.shape[0]))


def test_face_index_matches_cell_vertices(mesh):
    pos, cells, _ = mesh
    face_index, _, vei = compute_connectivity(cells, pos)
    # each cell's local face j must connect two of the cell's vertices
    for i in range(min(cells.shape[0], 50)):
        cv = set(cells[i])
        for j in range(3):
            f = face_index[j, i]
            assert {vei[0, f], vei[1, f]} <= cv


def test_reorder_orientation():
    pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    edges = np.array([[0, 1], [1, 0], [0, 2], [2, 0], [0, 3], [3, 0]])
    out = reorder_face(pos, edges)
    # dx>0 wins: sender must be the one with larger x
    np.testing.assert_array_equal(out[0], [1, 0])
    np.testing.assert_array_equal(out[1], [1, 0])
    # dx==0, dy>0: sender is the one with larger y
    np.testing.assert_array_equal(out[2], [2, 0])
    np.testing.assert_array_equal(out[3], [2, 0])
    np.testing.assert_array_equal(out[4], [0, 3])
    np.testing.assert_array_equal(out[5], [0, 3])


def test_owner_orientation_rule(mesh):
    """After reorder, the owner must be the cell whose centroid has larger x
    (or larger y when dx == 0) for interior faces."""
    pos, cells, _ = mesh
    _, cei, _ = compute_connectivity(cells, pos)
    centroids = pos[cells].mean(axis=1)
    interior = cei[0] != cei[1]
    dx = centroids[cei[0], 0] - centroids[cei[1], 0]
    dy = centroids[cei[0], 1] - centroids[cei[1], 1]
    ok = (dx > 0) | ((dx == 0) & (dy > 0))
    assert np.all(ok[interior])


def test_cell_face_sign(mesh):
    pos, cells, _ = mesh
    face_index, cei, _ = compute_connectivity(cells, pos)
    sign = compute_cell_face_sign(face_index, cei)
    F = cei.shape[1]
    # the reference dummy-flux check (fvm.py:158-206): scattering the sign
    # table back per face gives +1 on owner and -1 on interior neighbour
    per_face = np.zeros((F, 2))
    for i in range(cells.shape[0]):
        for j in range(3):
            f = face_index[j, i]
            if i == cei[0, f]:
                per_face[f, 0] = sign[i, j]
            else:
                per_face[f, 1] = sign[i, j]
    interior = cei[0] != cei[1]
    assert np.all(per_face[:, 0] == 1.0)
    assert np.all(per_face[interior, 1] == -1.0)
    assert np.all(per_face[~interior, 1] == 0.0)


def test_owner_local_slot(mesh):
    pos, cells, _ = mesh
    face_index, cei, _ = compute_connectivity(cells, pos)
    slot = compute_owner_local_slot(face_index, cei)
    F = cei.shape[1]
    for f in range(F):
        assert face_index[slot[f], cei[0, f]] == f


def test_geometry_normals_and_volume(mesh):
    pos, cells, vt = mesh
    geom = build_geometry(pos, cells, vt, NodeType)
    C = cells.shape[0]
    # outward normals: dot(face_pos - cell_pos, normal) >= 0 for each local face
    fpos = geom["face_pos"][geom["face_index"].T]          # (C, 3, 2)
    vec = fpos - geom["cell_pos"][:, None, :]
    dots = np.sum(vec * geom["cell_normal"], axis=-1)
    assert np.all(dots > -1e-6)
    # unit normals
    np.testing.assert_allclose(
        np.linalg.norm(geom["cell_normal"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(geom["face_normal"], axis=-1), 1.0, atol=1e-5)
    # face normal oriented owner -> neighbour
    owner = geom["cell_edge_index"][0]
    v = geom["face_pos"] - geom["cell_pos"][owner]
    assert np.all(np.sum(v * geom["face_normal"], axis=1) > -1e-7)
    # total volume == domain area (minus obstacle for cylinder)
    total = geom["cell_volume"].sum()
    assert 0 < total <= 2.0 * 1.0 + 1e-6
    # closed-surface identity: sum of A_k n_k over each cell's faces == 0
    area = geom["face_area"].reshape(-1)[geom["face_index"].T][..., None]
    closure = np.sum(geom["cell_normal"] * area, axis=1)
    np.testing.assert_allclose(closure, 0.0, atol=1e-5)
    assert C == geom["cell_face_sign"].shape[0]


def test_classify_edges_channel():
    pos, cells, vt = structured_channel_mesh(nx=6, ny=4)
    geom = build_geometry(pos, cells, vt, NodeType)
    ft = geom["face_type"].reshape(-1)
    boundary = geom["face_boundary_mask"]
    fpos = geom["face_pos"]
    eps = 1e-6
    # inflow faces lie on x=0, outflow on x=2
    assert np.all(np.abs(fpos[ft == NodeType.INFLOW, 0]) < eps)
    assert np.all(np.abs(fpos[ft == NodeType.OUTFLOW, 0] - 2.0) < eps)
    # all non-NORMAL faces must be on the boundary ring for this mesh
    assert np.all(boundary[ft != NodeType.NORMAL])
