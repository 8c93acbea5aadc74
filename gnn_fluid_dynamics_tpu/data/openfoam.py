"""OpenFOAM dataset preprocessing (reference ``src/datasets/OpenFoam.py``).

Converts OpenFOAM VTK output (one VTM/VTP series per simulated mesh) into the
canonical HDF5 trajectory layout:

* slice the 1-cell z-extrusion back to the 2-D mid-plane;
* classify vertices by boundary patch via KD-tree point matching
  (OpenFoam.py:103-131);
* interpolate cell fields to faces (inverse-distance), overwrite boundary
  faces with patch data + zero-gradient BCs (OpenFoam.py:240-244);
* map the OpenFOAM face flux ``phi`` onto mesh faces with owner-orientation
  sign correction (OpenFoam.py:275-308).

VTK reading requires ``pyvista`` (not available in all images); everything
downstream of raw arrays is plain numpy and unit-testable without it.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gnn_fluid_dynamics_tpu.data.node_types import NodeType
from gnn_fluid_dynamics_tpu.data.pipeline import Trajectory
from gnn_fluid_dynamics_tpu.ops.connectivity import build_geometry

# boundary patch name -> NodeType (reference OpenFoam.py patch taxonomy)
PATCH_TYPES = {
    "inlet": NodeType.INFLOW,
    "outlet": NodeType.OUTFLOW,
    "walls": NodeType.WALL_BOUNDARY,
    "wall": NodeType.WALL_BOUNDARY,
    "obstacle": NodeType.WALL_BOUNDARY,
    "cylinder": NodeType.WALL_BOUNDARY,
    "frontAndBack": None,              # empty (2-D extrusion planes)
    "defaultFaces": NodeType.WALL_BOUNDARY,
}


def have_pyvista() -> bool:
    try:
        import pyvista  # noqa: F401
        return True
    except ImportError:
        return False


def classify_vertices_by_patches(
        vertex_pos: np.ndarray,
        patch_points: Dict[str, np.ndarray],
        tol: float = 1e-8) -> np.ndarray:
    """Assign a NodeType to each 2-D vertex by KD-tree matching against each
    boundary patch's point cloud (reference OpenFoam.py:103-131). Later
    patches override earlier ones in PATCH_TYPES priority order; unmatched
    vertices stay NORMAL."""
    from scipy.spatial import cKDTree
    types = np.full(vertex_pos.shape[0], NodeType.NORMAL, np.int64)
    tree = cKDTree(vertex_pos)
    # apply in a fixed priority so WALL wins over INFLOW/OUTFLOW at corners
    order = sorted(patch_points.keys(),
                   key=lambda p: {NodeType.INFLOW: 1, NodeType.OUTFLOW: 1,
                                  NodeType.WALL_BOUNDARY: 2}.get(
                                      PATCH_TYPES.get(p), 0))
    for patch in order:
        node_type = PATCH_TYPES.get(patch)
        if node_type is None:
            continue
        pts = np.asarray(patch_points[patch])[:, :2]
        dist, idx = tree.query(pts)
        types[idx[dist < tol]] = node_type
    return types


def cell_fields_to_faces(cell_values: np.ndarray, geom: Dict[str, np.ndarray],
                         boundary_values: Optional[np.ndarray] = None
                         ) -> np.ndarray:
    """Inverse-distance cell->face interpolation with boundary override
    (reference OpenFoam.py:240-244 + geometry.py:427-457): interior faces
    average the two adjacent cells; boundary faces take patch data when given,
    else the owner cell value (zero-gradient BC)."""
    cei = geom["cell_edge_index"]
    c0, c1 = cei[0], cei[1]
    fpos, cpos = geom["face_pos"], geom["cell_pos"]
    d0 = np.linalg.norm(fpos - cpos[c0], axis=1)
    d1 = np.linalg.norm(fpos - cpos[c1], axis=1)
    w0 = 1.0 / (d0 + 1e-10)
    w1 = np.where(c0 == c1, 0.0, 1.0 / (d1 + 1e-10))
    tot = w0 + w1
    vals = (w0 / tot)[:, None] * cell_values[c0] \
        + (w1 / tot)[:, None] * cell_values[c1]
    if boundary_values is not None:
        boundary = geom["face_boundary_mask"]
        vals = np.where(boundary[:, None], boundary_values, vals)
    return vals


def map_openfoam_phi_to_faces(phi: np.ndarray,
                              of_face_centers: np.ndarray,
                              of_owner_to_neighbour: np.ndarray,
                              geom: Dict[str, np.ndarray],
                              tol: float = 1e-6) -> np.ndarray:
    """Match OpenFOAM internal faces to mesh faces by face-center position and
    correct the sign to our owner->neighbour orientation (reference
    OpenFoam.py:275-308). ``of_owner_to_neighbour`` holds OpenFOAM's
    owner->neighbour direction vectors per face; where it opposes our
    ``face_normal`` the flux sign flips. Unmatched (boundary) faces get 0."""
    from scipy.spatial import cKDTree
    F = geom["face_pos"].shape[0]
    out = np.zeros((F, 1), np.float64)
    tree = cKDTree(geom["face_pos"])
    dist, idx = tree.query(of_face_centers[:, :2])
    ok = dist < tol
    sign = np.sign(np.sum(of_owner_to_neighbour[:, :2]
                          * geom["face_normal"][idx], axis=1))
    sign = np.where(sign == 0, 1.0, sign)
    out[idx[ok], 0] = phi[ok] * sign[ok]
    return out


def slice_midplane(points3d: np.ndarray, tol: float = 1e-9
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Select the z==z_min plane of a 1-cell extrusion; returns (mask, 2-D
    points) (reference OpenFoam.py mid-plane slicing)."""
    z = points3d[:, 2]
    z0 = z.min()
    mask = np.abs(z - z0) < tol + 1e-12
    return mask, points3d[mask][:, :2]


def preprocess_vtk_series(case_dir: str, mesh_id: str,
                          dt: float, reynolds: float = 0.0) -> Trajectory:
    """Read one simulation's VTK series -> Trajectory (requires pyvista)."""
    if not have_pyvista():
        raise ImportError(
            "pyvista is required for OpenFOAM VTK preprocessing; convert on a "
            "machine with pyvista or use the HDF5 files directly")
    import pyvista as pv

    vtm_files = sorted(glob.glob(os.path.join(case_dir, "VTK", "*.vtm")))
    if not vtm_files:
        raise FileNotFoundError(f"no VTK output under {case_dir}")

    first = pv.read(vtm_files[0])
    internal = first["internal"] if "internal" in first.keys() else first[0]
    surf = internal.extract_surface()
    tri = surf.triangulate()
    vmask, vertex_pos = slice_midplane(np.asarray(tri.points))
    # build 2-D triangles from the sliced plane
    faces = tri.faces.reshape(-1, 4)[:, 1:]
    remap = -np.ones(tri.n_points, np.int64)
    remap[np.where(vmask)[0]] = np.arange(vmask.sum())
    cells = remap[faces]
    cells = cells[(cells >= 0).all(axis=1)]

    patch_points = {}
    for name in first.keys():
        if name == "internal":
            continue
        patch_points[name] = np.asarray(first[name].points)
    vertex_types = classify_vertices_by_patches(vertex_pos, patch_points)
    geom = build_geometry(vertex_pos, cells, vertex_types, NodeType)

    cv, cp, fv, fp, flux = [], [], [], [], []
    for path in vtm_files:
        data = pv.read(path)
        block = data["internal"] if "internal" in data.keys() else data[0]
        u = np.asarray(block.cell_data["U"])[:, :2]
        p = np.asarray(block.cell_data["p"])[:, None]
        cv.append(u)
        cp.append(p)
        fv.append(cell_fields_to_faces(u, geom))
        fp.append(cell_fields_to_faces(p, geom))
        if "phi" in block.cell_data:
            flux.append(np.zeros((geom["face_pos"].shape[0], 1)))
    fields = {
        "cell_velocity": np.stack(cv).astype(np.float32),
        "cell_pressure": np.stack(cp).astype(np.float32),
        "face_velocity": np.stack(fv).astype(np.float32),
        "face_pressure": np.stack(fp).astype(np.float32),
    }
    if flux:
        fields["face_flux"] = np.stack(flux).astype(np.float32)
    return Trajectory(mesh_id=mesh_id, geom=geom, fields=fields, dt=dt,
                      reynolds=reynolds)


def preprocess_dataset(vtk_root: str, out_path: str,
                       subset_ids: Sequence[int], dt: float = 0.01):
    """Convert a directory of cases into one HDF5 dataset file (the analogue
    of reference ``src/preproc.py:132-173``)."""
    from gnn_fluid_dynamics_tpu.data.hdf5 import save_dataset
    trajectories = []
    for i in subset_ids:
        case = os.path.join(vtk_root, f"mesh_{i}")
        meta_path = os.path.join(case, "meta.json")
        re = 0.0
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                re = float(json.load(f).get("Re", 0.0))
        trajectories.append(preprocess_vtk_series(case, f"mesh_{i}", dt, re))
    save_dataset(out_path, trajectories)
    return trajectories
