"""Dataset pipeline tests: HDF5 round-trip, samplers, converters, preproc
helpers."""

import numpy as np
import pytest

from gnn_fluid_dynamics_tpu.data.cylinderflow import (remap_node_types,
                                                      trajectory_from_vertex_fields)
from gnn_fluid_dynamics_tpu.data.hdf5 import (add_grad_weights_to_file,
                                              load_dataset, save_dataset)
from gnn_fluid_dynamics_tpu.data.node_types import CylinderNodeType, NodeType
from gnn_fluid_dynamics_tpu.data.openfoam import (cell_fields_to_faces,
                                                  classify_vertices_by_patches)
from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
from gnn_fluid_dynamics_tpu.data.samplers import (chunked_batches,
                                                  multi_mesh_batches,
                                                  per_mesh_batches,
                                                  rollout_order)
from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   structured_channel_mesh,
                                                   taylor_green_trajectory)


def make_traj(i=0, T=6):
    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=T, dt=0.01)
    return Trajectory(mesh_id=f"mesh_{i}", geom=geom, fields=fields,
                      dt=0.01, reynolds=100.0)


def test_hdf5_roundtrip(tmp_path):
    trajs = [make_traj(0), make_traj(1)]
    path = str(tmp_path / "train.h5")
    save_dataset(path, trajs)
    loaded = load_dataset(path)
    assert [t.mesh_id for t in loaded] == ["mesh_0", "mesh_1"]
    np.testing.assert_allclose(loaded[0].fields["cell_velocity"],
                               trajs[0].fields["cell_velocity"])
    np.testing.assert_array_equal(loaded[0].geom["cell_edge_index"],
                                  trajs[0].geom["cell_edge_index"])
    assert loaded[0].reynolds == 100.0
    # flux scaling knob (OpenFOAM 1/0.001, DataSet.py:259)
    scaled = load_dataset(path, flux_scale=1000.0)
    np.testing.assert_allclose(scaled[0].fields["face_flux"],
                               trajs[0].fields["face_flux"] * 1000.0,
                               rtol=1e-5)
    # selection semantics
    assert len(load_dataset(path, sim_limit=1)) == 1
    assert load_dataset(path, sim_index=[1])[0].mesh_id == "mesh_1"


def test_hdf5_grad_weights_cache(tmp_path):
    path = str(tmp_path / "train.h5")
    save_dataset(path, [make_traj(0)])
    add_grad_weights_to_file(path, "cell", 1)
    add_grad_weights_to_file(path, "cell", 1)  # no-op second time
    loaded = load_dataset(path, grad_weights_order={"cell": 1})
    assert "cell_grad_weights" in loaded[0].grad_weights
    w = loaded[0].grad_weights["cell_grad_weights"]
    assert w.shape[2] == 2 and w.shape[1] == 6  # K = 2 * 3 terms for order 1


def test_samplers():
    ds = MeshDataset([make_traj(i) for i in range(4)], pad_multiple=32)
    rng = np.random.default_rng(0)

    ro = rollout_order(ds)
    assert len(ro[0]) == 4
    assert all(s[1] == ds.timestep_range[0] for s in ro[0])

    batches = list(multi_mesh_batches(ds, 4, rng))
    assert all(len(b) == 4 for b in batches)

    for b in per_mesh_batches(ds, 2, rng):
        assert len({m for m, _ in b}) == 1

    chunk = list(chunked_batches(ds, 2, rng, chunk_meshes=2))
    # every chunked batch draws from at most 2 distinct meshes
    assert all(len({m for m, _ in b}) <= 2 for b in chunk)


def test_cylinderflow_conversion():
    pos, cells, vt = structured_channel_mesh(nx=5, ny=3)
    # DeepMind-style node types
    ntype = np.full(pos.shape[0], CylinderNodeType.NORMAL)
    ntype[vt == NodeType.INFLOW] = CylinderNodeType.INFLOW
    ntype[vt == NodeType.OUTFLOW] = CylinderNodeType.OUTFLOW
    ntype[vt == NodeType.WALL_BOUNDARY] = CylinderNodeType.WALL_BOUNDARY
    T, V = 3, pos.shape[0]
    rng = np.random.default_rng(0)
    vel = np.tile([1.0, 0.5], (T, V, 1)).astype(np.float32)
    p = rng.normal(size=(T, V, 1)).astype(np.float32)
    traj = trajectory_from_vertex_fields("mesh_0", pos, cells, ntype, vel, p)
    C = traj.geom["cell_pos"].shape[0]
    assert traj.fields["cell_velocity"].shape == (T, C, 2)
    # constant field interpolates exactly
    np.testing.assert_allclose(traj.fields["cell_velocity"][0],
                               np.tile([1.0, 0.5], (C, 1)), atol=1e-6)
    np.testing.assert_allclose(traj.fields["face_velocity"][0, :, 0], 1.0,
                               atol=1e-6)
    # types remapped onto the 5-class taxonomy
    assert set(np.unique(traj.geom["face_type"])) <= {0, 1, 2, 3, 4}


def test_remap_node_types():
    x = np.array([0, 1, 4, 5, 6])
    np.testing.assert_array_equal(
        remap_node_types(x),
        [NodeType.NORMAL, NodeType.WALL_BOUNDARY, NodeType.INFLOW,
         NodeType.OUTFLOW, NodeType.WALL_BOUNDARY])


def test_classify_vertices_by_patches():
    pos, cells, _ = structured_channel_mesh(nx=4, ny=3, lx=2.0, ly=1.0)
    patches = {
        "inlet": np.concatenate(
            [pos[np.abs(pos[:, 0]) < 1e-9], np.zeros((np.sum(np.abs(pos[:, 0]) < 1e-9), 1))], axis=1),
        "outlet": np.concatenate(
            [pos[np.abs(pos[:, 0] - 2.0) < 1e-9], np.zeros((np.sum(np.abs(pos[:, 0] - 2.0) < 1e-9), 1))], axis=1),
        "walls": np.concatenate(
            [pos[(np.abs(pos[:, 1]) < 1e-9) | (np.abs(pos[:, 1] - 1.0) < 1e-9)],
             np.zeros((np.sum((np.abs(pos[:, 1]) < 1e-9) | (np.abs(pos[:, 1] - 1.0) < 1e-9)), 1))], axis=1),
    }
    types = classify_vertices_by_patches(pos, patches)
    assert (types[np.abs(pos[:, 0]) < 1e-9] != NodeType.NORMAL).all()
    # walls take priority at corners
    corner = (np.abs(pos[:, 0]) < 1e-9) & (np.abs(pos[:, 1]) < 1e-9)
    assert (types[corner] == NodeType.WALL_BOUNDARY).all()
    interior = ((pos[:, 0] > 0.1) & (pos[:, 0] < 1.9)
                & (pos[:, 1] > 0.1) & (pos[:, 1] < 0.9))
    assert (types[interior] == NodeType.NORMAL).all()


def test_cell_fields_to_faces_constant():
    geom = make_geometry("structured", nx=5, ny=3)
    C = geom["cell_pos"].shape[0]
    vals = np.tile([2.0, -1.0], (C, 1))
    face_vals = cell_fields_to_faces(vals, geom)
    np.testing.assert_allclose(face_vals, np.tile([2.0, -1.0],
                                                  (geom["face_pos"].shape[0], 1)),
                               atol=1e-6)
    # boundary override
    bvals = np.tile([9.0, 9.0], (geom["face_pos"].shape[0], 1))
    face_vals2 = cell_fields_to_faces(vals, geom, boundary_values=bvals)
    b = geom["face_boundary_mask"]
    np.testing.assert_allclose(face_vals2[b], 9.0)
    np.testing.assert_allclose(face_vals2[~b], face_vals[~b])


def test_tfrecord_converter_roundtrip(tmp_path):
    """Write a tiny DeepMind-schema tfrecord and convert it to canonical h5
    (covers data/cylinderflow.convert_tfrecord end to end)."""
    tf = pytest.importorskip("tensorflow")
    import json
    import numpy as np
    from gnn_fluid_dynamics_tpu.data.cylinderflow import convert_tfrecord
    from gnn_fluid_dynamics_tpu.data.hdf5 import load_dataset
    from gnn_fluid_dynamics_tpu.data.synthetic import structured_channel_mesh

    pos, cells, _ = structured_channel_mesh(nx=5, ny=4)
    pos = pos.astype(np.float32)
    cells = cells.astype(np.int32)
    V, T = pos.shape[0], 4
    ntype = np.zeros((V, 1), np.int32)
    vel = np.random.RandomState(0).rand(T, V, 2).astype(np.float32)
    prs = np.random.RandomState(1).rand(T, V, 1).astype(np.float32)

    meta = {
        "trajectory_length": T,
        "field_names": ["mesh_pos", "cells", "node_type", "velocity",
                        "pressure"],
        "features": {
            "mesh_pos": {"type": "static", "shape": [1, V, 2],
                         "dtype": "float32"},
            "cells": {"type": "static", "shape": [1, cells.shape[0], 3],
                      "dtype": "int32"},
            "node_type": {"type": "static", "shape": [1, V, 1],
                          "dtype": "int32"},
            "velocity": {"type": "dynamic", "shape": [T, V, 2],
                         "dtype": "float32"},
            "pressure": {"type": "dynamic", "shape": [T, V, 1],
                         "dtype": "float32"},
        },
    }
    meta_path = tmp_path / "meta.json"
    meta_path.write_text(json.dumps(meta))

    def bytes_feature(arr):
        return tf.train.Feature(bytes_list=tf.train.BytesList(
            value=[arr.tobytes()]))

    ex = tf.train.Example(features=tf.train.Features(feature={
        "mesh_pos": bytes_feature(pos[None]),
        "cells": bytes_feature(cells[None]),
        "node_type": bytes_feature(ntype[None]),
        "velocity": bytes_feature(vel),
        "pressure": bytes_feature(prs),
    }))
    rec = tmp_path / "train.tfrecord"
    with tf.io.TFRecordWriter(str(rec)) as w:
        w.write(ex.SerializeToString())

    out_h5 = tmp_path / "train.h5"
    trajs = convert_tfrecord(str(rec), str(meta_path), str(out_h5))
    assert len(trajs) == 1
    loaded = load_dataset(str(out_h5))
    assert len(loaded) == 1
    t = loaded[0]
    assert t.fields["cell_velocity"].shape[0] == T
    assert np.isfinite(t.fields["cell_velocity"]).all()


def test_balanced_chunked_sampler_single_combo_per_chunk():
    """balanced_chunked batches must share one sorted mesh combination per
    chunk (device batched-graph cache reuse) and cover every mesh."""
    import numpy as np
    from gnn_fluid_dynamics_tpu.data.samplers import balanced_chunked_batches

    class FakeDS:
        sample_map = [(f"m{i}", t) for i in range(6) for t in range(10)]
        bucket_of = {f"m{i}": 0 for i in range(6)}

    rng = np.random.default_rng(0)
    batches = list(balanced_chunked_batches(FakeDS(), 3, rng))
    combos = [tuple(m for m, _ in b) for b in batches]
    assert all(c == tuple(sorted(c)) for c in combos)
    assert len(set(combos)) == 2                      # 6 meshes / batch 3
    seen = {m for b in batches for m, _ in b}
    assert seen == {f"m{i}" for i in range(6)}
    # each mesh's timesteps are all visited within its chunk
    per_mesh = {}
    for b in batches:
        for m, t in b:
            per_mesh.setdefault(m, set()).add(t)
    assert all(len(v) == 10 for v in per_mesh.values())


# ---------------------------------------------------------------------------
# Out-of-core (lazy) dataset path — VERDICT item 6; reference streams from
# HDF5 with SWMR handles + a bounded geometry LRU (DataSet.py:127-172)
# ---------------------------------------------------------------------------

def _varied_traj(i, T=6):
    geom = make_geometry("structured", nx=6 + i % 3, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=T, dt=0.01)
    return Trajectory(mesh_id=f"mesh_{i}", geom=geom, fields=fields,
                      dt=0.01, reynolds=100.0)


def test_lazy_dataset_matches_eager(tmp_path):
    from gnn_fluid_dynamics_tpu.data.hdf5 import load_dataset_lazy

    trajs = [_varied_traj(i) for i in range(6)]
    path = str(tmp_path / "train.h5")
    save_dataset(path, trajs)

    eager = MeshDataset(load_dataset(path), pad_multiple=32)
    lazy_trajs = load_dataset_lazy(path, cache_entries=8)
    lazy = MeshDataset(lazy_trajs, pad_multiple=32, max_cached_graphs=2)

    samples = [("mesh_0", 1), ("mesh_3", 2)]
    ge, gl = eager.get_batch(samples), lazy.get_batch(samples)
    np.testing.assert_allclose(np.asarray(ge.cell_velocity),
                               np.asarray(gl.cell_velocity))
    np.testing.assert_allclose(np.asarray(ge.face_flux),
                               np.asarray(gl.face_flux))
    np.testing.assert_array_equal(np.asarray(ge.face_index),
                                  np.asarray(gl.face_index))
    # trajectory_fields must agree too (rollout GT path)
    fe = eager.trajectory_fields(["mesh_1", "mesh_2"], 0, 3)
    fl = lazy.trajectory_fields(["mesh_1", "mesh_2"], 0, 3)
    for k in fe:
        np.testing.assert_allclose(fe[k], fl[k])
    # flux scaling applies on read
    scaled = load_dataset_lazy(path, flux_scale=1000.0)
    np.testing.assert_allclose(scaled[0].fields["face_flux"][1],
                               trajs[0].fields["face_flux"][1] * 1000.0,
                               rtol=1e-5)
    # selection semantics match the eager loader
    assert len(load_dataset_lazy(path, sim_limit=2)) == 2
    assert load_dataset_lazy(path, sim_index=[3])[0].mesh_id == "mesh_3"


def test_lazy_dataset_bounded_caches(tmp_path):
    """Static-graph / banded-table / geometry caches must stay within the
    configured bound while every mesh in a large dataset is visited."""
    from gnn_fluid_dynamics_tpu.data.hdf5 import load_dataset_lazy

    n = 12
    path = str(tmp_path / "train.h5")
    save_dataset(path, [_varied_traj(i) for i in range(n)])

    lazy_trajs = load_dataset_lazy(path, cache_entries=5)
    store = lazy_trajs[0].geom.store
    ds = MeshDataset(lazy_trajs, pad_multiple=128, with_banded=True,
                     max_cached_graphs=3)
    for i in range(n):
        g = ds.get_batch([(f"mesh_{i}", 0), (f"mesh_{(i + 1) % n}", 1)])
        assert np.isfinite(np.asarray(g.cell_velocity)).all()
        assert len(ds._static_graphs) <= 3
        assert len(ds._tables_cache) <= 3
        assert len(store._cache) <= 5
    assert store.misses > 0 and store.hits > 0


def test_lazy_banded_equals_eager_banded(tmp_path):
    """The lazy path's on-demand banded tables (rebased to the streamed
    canonical spec) must match the eager eagerly-canonicalized tables."""
    from gnn_fluid_dynamics_tpu.data.hdf5 import load_dataset_lazy

    path = str(tmp_path / "train.h5")
    save_dataset(path, [_varied_traj(i) for i in range(4)])

    eager = MeshDataset(load_dataset(path), pad_multiple=128,
                        with_banded=True)
    lazy = MeshDataset(load_dataset_lazy(path, cache_entries=4),
                       pad_multiple=128, with_banded=True,
                       max_cached_graphs=2)
    samples = [("mesh_0", 0), ("mesh_2", 3)]
    ge, gl = eager.get_batch(samples), lazy.get_batch(samples)
    np.testing.assert_array_equal(np.asarray(ge.hv_off), np.asarray(gl.hv_off))
    np.testing.assert_allclose(np.asarray(ge.hv_onehot),
                               np.asarray(gl.hv_onehot))
    np.testing.assert_allclose(np.asarray(ge.fc3_onehot),
                               np.asarray(gl.fc3_onehot))


def test_lazy_rcm_permuted_fields(tmp_path):
    """PermutedLazyArray must reproduce reorder_fields on read."""
    from gnn_fluid_dynamics_tpu.data.hdf5 import (PermutedLazyArray,
                                                  TransformedLazyGeom,
                                                  load_dataset_lazy)
    from gnn_fluid_dynamics_tpu.ops.reorder import (perms_from_pos,
                                                    rcm_reorder_geometry,
                                                    reorder_fields)

    traj = _varied_traj(0)
    path = str(tmp_path / "train.h5")
    save_dataset(path, [traj])

    new_geom = rcm_reorder_geometry(traj.geom)
    ref_fields = reorder_fields(traj.fields, traj.geom, new_geom)

    lt = load_dataset_lazy(path)[0]
    cperm, fperm = perms_from_pos(lt.geom, new_geom)
    lg = TransformedLazyGeom(lt.geom, rcm_reorder_geometry, "__rcm__")
    np.testing.assert_allclose(lg["cell_pos"], new_geom["cell_pos"])
    pv = PermutedLazyArray(lt.fields["cell_velocity"], cperm)
    pf = PermutedLazyArray(lt.fields["face_flux"], fperm)
    np.testing.assert_allclose(pv[2], ref_fields["cell_velocity"][2])
    np.testing.assert_allclose(pv[1:3], ref_fields["cell_velocity"][1:3])
    np.testing.assert_allclose(pf[0], ref_fields["face_flux"][0])


# ---------------------------------------------------------------------------
# Self-contained VTK reader + OpenFOAM VTK preprocessing (no pyvista)
# ---------------------------------------------------------------------------

def _write_wedge_case(case_dir, geom, fields, n_steps=3):
    """Synthetic foamToVTK-layout case: the 2-D mesh extruded to one layer of
    wedges, per-step VTM+VTU with U/p cell data, boundary patch VTPs, and
    surfaceFields_*.vtp files carrying phi point data at face centers (plus
    decoy front/back-plane points that the z-filter must drop)."""
    import os
    from gnn_fluid_dynamics_tpu.data import vtk_io
    from gnn_fluid_dynamics_tpu.data.node_types import NodeType

    vp = geom["vertex_pos"]
    # recover triangles from vertex_face (3, C)
    tris = np.asarray(geom["vertex_face"]).T
    Nv, C = vp.shape[0], tris.shape[0]
    h = 0.1
    pts3 = np.concatenate([
        np.concatenate([vp, np.zeros((Nv, 1))], axis=1),
        np.concatenate([vp, np.full((Nv, 1), h)], axis=1)])
    conn = np.concatenate([tris, tris + Nv], axis=1).reshape(-1)
    offsets = np.arange(1, C + 1) * 6
    types = np.full(C, 13, np.uint8)               # VTK_WEDGE

    vtk_dir = os.path.join(case_dir, "VTK")
    sf_dir = os.path.join(vtk_dir, "surfaceFields")
    os.makedirs(sf_dir, exist_ok=True)

    # boundary patches from positions (structured channel: x=0 inlet,
    # x=max outlet, y extremes walls), both extrusion layers
    x, y = np.asarray(vp[:, 0], np.float64), np.asarray(vp[:, 1], np.float64)
    eps = 1e-6
    patches = {"inlet": x < x.min() + eps,
               "outlet": x > x.max() - eps,
               "walls": (y < y.min() + eps) | (y > y.max() - eps)}
    fpos = np.asarray(geom["face_pos"])
    fnrm = np.asarray(geom["face_normal"])
    area = np.asarray(geom["face_area"]).reshape(-1)

    for step in range(n_steps):
        u3 = np.concatenate([fields["cell_velocity"][step],
                             np.zeros((C, 1))], axis=1)
        vtu = f"internal_{step}.vtu"
        vtk_io.write_vtu(os.path.join(vtk_dir, vtu), pts3, conn, offsets,
                         types,
                         cell_data={"U": u3,
                                    "p": fields["cell_pressure"][step][:, 0]})
        blocks = [("internal", vtu)]
        for name, mask in patches.items():
            if not mask.any():
                continue
            ppts = np.concatenate([
                np.concatenate([vp[mask], np.zeros((mask.sum(), 1))], axis=1),
                np.concatenate([vp[mask], np.full((mask.sum(), 1), h)], axis=1)])
            rel = f"{name}_{step}.vtp"
            vtk_io.write_vtp(os.path.join(vtk_dir, rel), ppts)
            blocks.append((name, rel))
        vtk_io.write_vtm(os.path.join(vtk_dir, f"case_{step}.vtm"), blocks)

        # phi at face centers (side points, z = h/2) with RANDOM owner signs
        # — the preprocessor must resolve them against the face velocity —
        # plus decoy z=0 points the 1% z-filter must drop
        uf = fields["face_velocity"][step]
        phi = np.sum(uf * fnrm, axis=1) * area
        rng = np.random.default_rng(step)
        flip = rng.random(phi.shape[0]) < 0.5
        phi_of = np.where(flip, -phi, phi)
        side_pts = np.concatenate([fpos, np.full((fpos.shape[0], 1), h / 2)],
                                  axis=1)
        decoys = np.concatenate([
            np.concatenate([fpos[:5], np.zeros((5, 1))], axis=1),
            np.concatenate([fpos[:5], np.full((5, 1), h)], axis=1)])
        all_pts = np.concatenate([side_pts, decoys])
        all_phi = np.concatenate([phi_of, np.full(10, 1e6)])
        vtk_io.write_vtp(os.path.join(sf_dir, f"surfaceFields_{step}.vtp"),
                         all_pts, point_data={"phi": all_phi})


def test_vtk_io_encodings(tmp_path):
    """The reader must handle ascii, inline base64, appended raw, and
    zlib-compressed appended encodings with UInt32/UInt64 headers."""
    import base64 as b64
    import zlib
    from gnn_fluid_dynamics_tpu.data import vtk_io

    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    raw = pts.tobytes()

    def build(fmt, header_dtype, compress):
        hd = np.dtype(header_dtype)
        comp_attr = (' compressor="vtkZLibDataCompressor"' if compress else "")
        if compress:
            comp = zlib.compress(raw)
            header = np.array([1, len(raw), len(raw), len(comp)],
                              hd).tobytes()
            payload = header + comp
        else:
            payload = np.array([len(raw)], hd).tobytes() + raw
        if fmt == "appended":
            body = (f'<Points><DataArray type="Float32" '
                    f'NumberOfComponents="3" format="appended" offset="0"/>'
                    f"</Points>")
            app = b'<AppendedData encoding="raw">_' + payload \
                + b"</AppendedData>"
        else:
            b = b64.b64encode(payload).decode()
            body = (f'<Points><DataArray type="Float32" '
                    f'NumberOfComponents="3" format="binary">{b}'
                    f"</DataArray></Points>")
            app = b""
        htname = {4: "UInt32", 8: "UInt64"}[hd.itemsize]
        xml = (f'<?xml version="1.0"?><VTKFile type="PolyData" '
               f'byte_order="LittleEndian" header_type="{htname}"{comp_attr}>'
               f'<PolyData><Piece NumberOfPoints="4" NumberOfPolys="0">'
               f"{body}<PointData/></Piece></PolyData></VTKFile>"
               ).encode()
        if app:
            xml = xml.replace(b"</VTKFile>", app + b"</VTKFile>")
        p = tmp_path / f"t_{fmt}_{htname}_{compress}.vtp"
        p.write_bytes(xml)
        return str(p)

    for fmt in ("appended", "binary"):
        for hd in (np.uint32, np.uint64):
            for compress in (False, True):
                g = vtk_io.read_vtp(build(fmt, hd, compress))
                np.testing.assert_allclose(g.points, pts, rtol=1e-6)
    # ascii round-trip via the writer
    vtk_io.write_vtp(str(tmp_path / "a.vtp"), pts.astype(np.float64),
                     point_data={"phi": np.arange(4.0)})
    g = vtk_io.read_vtp(str(tmp_path / "a.vtp"))
    np.testing.assert_allclose(g.points, pts, rtol=1e-6)
    np.testing.assert_allclose(g.point_data["phi"], np.arange(4.0))


def test_openfoam_vtk_preprocessing_end_to_end(tmp_path):
    """preprocess_vtk_series must run without pyvista: wedge mid-plane
    extraction preserves cell order (U/p map 1:1), patches classify vertex
    types, and phi lands on faces with velocity-consistent signs
    (reference OpenFoam.py:275-308)."""
    from gnn_fluid_dynamics_tpu.data.openfoam import preprocess_vtk_series

    geom = make_geometry("structured", nx=8, ny=5)
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    case = str(tmp_path / "mesh_0")
    _write_wedge_case(case, geom, fields, n_steps=3)

    traj = preprocess_vtk_series(case, "mesh_0", dt=0.01, reynolds=100.0)
    assert traj.geom["cell_pos"].shape == geom["cell_pos"].shape
    np.testing.assert_allclose(traj.geom["vertex_pos"], geom["vertex_pos"],
                               atol=1e-12)
    # topology identical; patch classification puts the right types on the
    # right boundaries (corner priority may differ from make_geometry's)
    np.testing.assert_array_equal(traj.geom["face_boundary_mask"],
                                  geom["face_boundary_mask"])
    ft = np.asarray(traj.geom["face_type"]).reshape(-1)
    x = np.asarray(traj.geom["face_pos"])[:, 0]
    bnd = np.asarray(traj.geom["face_boundary_mask"]).reshape(-1)
    # every face ON the inlet/outlet plane carries the right type (corner
    # wall+inflow pairs elsewhere may also type INFLOW — a reference rule)
    assert (ft[bnd & (x < x.min() + 1e-6)] == NodeType.INFLOW).all()
    assert (ft[bnd & (x > x.max() - 1e-6)] == NodeType.OUTFLOW).all()
    assert (ft[bnd & (x < x.min() + 1e-6)]).size > 0
    assert (ft[bnd & (x > x.max() - 1e-6)]).size > 0
    # NB: the reference classifies purely from vertex-type pairs
    # (geometry.py:389-424), so an interior face between two boundary
    # vertices may carry a boundary type — not asserted NORMAL here.
    # cell data alignment: exact 1:1 (no resampling)
    np.testing.assert_allclose(traj.fields["cell_velocity"][1],
                               fields["cell_velocity"][1], rtol=1e-6)
    np.testing.assert_allclose(traj.fields["cell_pressure"][2],
                               fields["cell_pressure"][2], rtol=1e-6)
    # phi recovered with the preprocessor's sign convention: matching
    # sign(u_f . n_f) despite the randomized owner signs in the file
    fnrm = traj.geom["face_normal"]
    area = traj.geom["face_area"].reshape(-1)
    uf_interp = traj.fields["face_velocity"][1]
    expect = np.sum(fields["face_velocity"][1] * fnrm, axis=1) * area
    got = traj.fields["face_flux"][1][:, 0]
    vd = np.sum(uf_interp * fnrm, axis=1)
    live = np.abs(got) > 1e-12
    np.testing.assert_allclose(np.abs(got[live]), np.abs(expect[live]),
                               rtol=1e-5)
    agree = np.sign(got[live]) == np.sign(vd[live])
    assert agree.mean() > 0.99
