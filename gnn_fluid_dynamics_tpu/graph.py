"""The core mesh-graph data structure.

The reference represents each sample as three PyG ``Data`` objects
(``[cell_graph, face_graph, vertex_graph]``, reference
``src/datasets/DataSet.py:210-274``) with dynamic shapes. On TPU dynamic shapes
force recompilation and block MXU tiling, so here the whole sample is one typed
pytree of *padded, static-shape* arrays plus validity masks. Batching is
concatenation along the element axes with per-element graph ids (the functional
analogue of PyG's ``Batch``), so jit caches stay small (one compile per bucket
shape).

Conventions (all matching the reference's numerical contract):

* ``F`` faces == vertex edges (a triangular 2-D mesh's faces are its edges).
* ``cell_edge_index`` has shape ``(2, F)`` = ``[owner, neighbour]`` per face;
  boundary faces are self-loops ``[c, c]`` (reference
  ``src/utils/geometry.py:149-160``).
* ``face_index`` a.k.a. ``f_graph.face`` has shape ``(3, C)``: the 3 global face
  ids of each cell, in ``triangles_to_faces`` local order (reference
  ``src/utils/geometry.py:128-137``).
* ``vertex_face`` has shape ``(3, C)``: the 3 vertex ids of each cell.
* ``cell_normal`` has shape ``(C, 3, 2)``: outward unit normal of each cell's
  3 faces (reference ``src/utils/geometry.py:205-268``).
* ``cell_face_sign`` has shape ``(C, 3)``: +1 where the cell owns its local
  face, -1 where it is the interior neighbour (precomputed replacement for the
  dynamic owner/neighbour bookkeeping in reference ``src/utils/fvm.py:96-156``).
* ``owner_local_slot`` has shape ``(F,)``: which of the owner cell's 3 local
  slots corresponds to each global face (precomputed replacement for reference
  ``src/utils/fvm.py:74-92``).

Padded elements point at the *last* (padded) slot of their target axis and are
zeroed by the masks, so gathers stay in-bounds and segment sums accumulate into
a discarded slot.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MeshGraph:
    """A (possibly batched, possibly padded) triangular mesh graph sample."""

    # --- geometry: cells ---
    cell_pos: jax.Array          # (C, 2)
    cell_volume: jax.Array       # (C, 1)
    cell_normal: jax.Array       # (C, 3, 2) outward unit normals of local faces
    cell_edge_index: jax.Array   # (2, F) int32 [owner, neighbour]
    cell_face_sign: jax.Array    # (C, 3) float  +1 owner / -1 neighbour / 0 pad
    # --- geometry: faces (== vertex edges) ---
    face_pos: jax.Array          # (F, 2)
    face_area: jax.Array         # (F, 1)
    face_normal: jax.Array       # (F, 2) unit, oriented owner -> neighbour
    face_type: jax.Array         # (F, 1) int32 NodeType codes
    face_index: jax.Array        # (3, C) int32 global face ids per cell
    owner_local_slot: jax.Array  # (F,) int32 local slot of face in owner cell
    # --- geometry: vertices ---
    vertex_pos: jax.Array        # (V, 2)
    vertex_edge_index: jax.Array  # (2, F) int32 [v_min... ordering per reference]
    vertex_face: jax.Array       # (3, C) int32 vertex ids per cell
    # --- masks (padding validity) ---
    cell_mask: jax.Array         # (C,) bool
    face_mask: jax.Array         # (F,) bool
    vertex_mask: jax.Array       # (V,) bool
    face_boundary_mask: jax.Array  # (F,) bool  owner == neighbour
    # --- batching ---
    cell_batch: jax.Array        # (C,) int32 graph id per cell
    face_batch: jax.Array        # (F,) int32 graph id per face
    num_graphs: int = struct.field(pytree_node=False, default=1)
    # --- meta ---
    dt: jax.Array = None          # () or (num_graphs,) timestep
    reynolds: jax.Array = None    # () or (num_graphs,)
    # --- time-windowed fields (W = data window) ---
    cell_velocity: jax.Array = None   # (C, W, 2)
    cell_pressure: jax.Array = None   # (C, W, 1)
    face_velocity: jax.Array = None   # (F, W, 2)
    face_pressure: jax.Array = None   # (F, W, 1)
    face_flux: jax.Array = None       # (F, W, 1) or None
    # --- optional MLS gradient weights ---
    cell_grad_weights: jax.Array = None     # (C, K, 2)
    cell_grad_neighbours: jax.Array = None  # (C, K) int32
    face_grad_weights: jax.Array = None     # (F, K, 2)
    face_grad_neighbours: jax.Array = None  # (F, K) int32
    # --- optional precomputed vertex<-edge incidence (gather aggregation) ---
    vertex_inc_edge: jax.Array = None       # (V, D) int32
    vertex_inc_half: jax.Array = None       # (V, D) int32 0=fwd 1=rev
    vertex_inc_valid: jax.Array = None      # (V, D) bool
    # --- optional banded one-hot aggregation tables (ops/banded.py). Band
    # starts are STATIC (tuples) so XLA sees constant slice offsets. ---
    hv_onehot: jax.Array = None             # (Tv, 128, Bhv) halfedge->vertex
    vc_onehot: jax.Array = None             # (Tc, 128, Bvc) vertex->cell (1/3)
    cf_row_onehot: jax.Array = None         # (Tf, 128, Bcf) owner selector
    cf_col_onehot: jax.Array = None         # (Tf, 128, Bcf) neighbour selector
    hv_off: jax.Array = None                # (Tv,) int32 per-tile band start
    vc_off: jax.Array = None                # (Tc,)
    cf_off: jax.Array = None                # (Tf,)
    # edge-space send/recv selectors (Pallas aggregation backend)
    es_onehot: jax.Array = None             # (Tv, 128, Bes)
    er_onehot: jax.Array = None
    es_off: jax.Array = None                # (Tv,)
    # face -> (cell, local slot) selector (integrator gathers)
    fc3_onehot: jax.Array = None            # (T3, 128, Bfc)
    fc3_off: jax.Array = None               # (T3,)
    # index-built selector vectors (rollout Pallas backend): the 0/1 tables
    # above rebuilt on-chip from ~KB of indices (ops/pallas_agg.py *_idx
    # kernels); derived host-side in to_static_bands
    es_tgt: jax.Array = None                # (Tv, 1, Bes) int32, -1 dead col
    er_tgt: jax.Array = None                # (Tv, 1, Bes)
    cf_row_idx: jax.Array = None            # (Tf, 128, 1) int32, -1 none
    cf_col_idx: jax.Array = None            # (Tf, 128, 1)
    vc_idx0: jax.Array = None               # (Tc, 128, 1) int32 per-vertex
    vc_idx1: jax.Array = None
    vc_idx2: jax.Array = None
    # static per-graph band specs: one (Tp, Sp[, offsets]) entry per graph in
    # the batch; offsets embedded => static-slice fast path (rollout)
    hv_start: tuple = struct.field(pytree_node=False, default=None)
    vc_start: tuple = struct.field(pytree_node=False, default=None)
    cf_start: tuple = struct.field(pytree_node=False, default=None)
    es_start: tuple = struct.field(pytree_node=False, default=None)
    fc3_start: tuple = struct.field(pytree_node=False, default=None)

    # ---- derived sizes (static) ----
    @property
    def num_cells(self) -> int:
        return self.cell_pos.shape[0]

    @property
    def num_faces(self) -> int:
        return self.face_pos.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertex_pos.shape[0]

    def replace(self, **kwargs) -> "MeshGraph":
        return dataclasses.replace(self, **kwargs)


# -----------------------------------------------------------------------------
# Construction from a geometry dict (numpy) + field arrays
# -----------------------------------------------------------------------------

GEOM_KEYS = (
    "vertex_pos", "vertex_edge_index", "vertex_face", "face_normal", "face_pos",
    "face_area", "face_index", "face_type", "face_boundary_mask", "cell_pos",
    "cell_edge_index", "cell_volume", "cell_normal", "cell_face_sign",
    "owner_local_slot",
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def from_geometry(
    geom: Dict[str, np.ndarray],
    fields: Optional[Dict[str, np.ndarray]] = None,
    dt: float = 0.01,
    reynolds: float = 0.0,
    pad_multiple: int = 0,
    pad_to: Optional[Dict[str, int]] = None,
    dtype=jnp.float32,
    with_incidence: bool = False,
    with_banded: bool = False,
    banded_dtype=jnp.float32,
    banded_static: bool = True,
    band_pad: Optional[Dict[str, int]] = None,
    banded_tables=None,
    max_degree: int = 0,
) -> MeshGraph:
    """Build a (single-graph) MeshGraph from a numpy geometry dict.

    ``geom`` must contain the canonical keys written by
    :func:`gnn_fluid_dynamics_tpu.ops.connectivity.build_geometry` (mirroring the
    reference's HDF5 geometry group, ``src/datasets/DataSet.py:296-310``).

    ``fields`` may contain time-windowed arrays keyed ``cell_velocity`` (W, C, 2)
    etc. in *time-major* layout, as stored in the reference HDF5 files; they are
    transposed to element-major ``(C, W, ...)`` here (reference
    ``src/datasets/DataSet.py:220-221``).

    Padding: if ``pad_multiple > 0``, each element axis is padded up to the next
    multiple. ``pad_to`` may give exact target sizes ``{"cell": C', "face": F',
    "vertex": V'}`` (used by bucketed batching).
    """
    fields = fields or {}
    C = int(geom["cell_pos"].shape[0])
    F = int(geom["face_pos"].shape[0])
    V = int(geom["vertex_pos"].shape[0])

    if pad_to is not None:
        Cp, Fp, Vp = pad_to["cell"], pad_to["face"], pad_to["vertex"]
    elif pad_multiple:
        Cp, Fp, Vp = (_round_up(C, pad_multiple), _round_up(F, pad_multiple),
                      _round_up(V, pad_multiple))
    else:
        Cp, Fp, Vp = C, F, V
    assert Cp >= C and Fp >= F and Vp >= V

    def padf(x, n, axis=0, value=0.0):
        x = np.asarray(x)
        if x.shape[axis] == n:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, n - x.shape[axis])
        return np.pad(x, widths, constant_values=value)

    # Padded index arrays point at the last (padded) slot so gathers stay
    # in-bounds and segment sums land in a discarded row.
    pad_cell, pad_face, pad_vertex = Cp - 1, Fp - 1, Vp - 1
    if Cp == C:
        pad_cell = 0  # unused
    if Fp == F:
        pad_face = 0
    if Vp == V:
        pad_vertex = 0

    cell_edge_index = padf(geom["cell_edge_index"], Fp, axis=1,
                           value=pad_cell).astype(np.int32)
    vertex_edge_index = padf(geom["vertex_edge_index"], Fp, axis=1,
                             value=pad_vertex).astype(np.int32)
    face_index = padf(geom["face_index"], Cp, axis=1,
                      value=pad_face).astype(np.int32)
    vertex_face = padf(geom["vertex_face"], Cp, axis=1,
                       value=pad_vertex).astype(np.int32)
    owner_local_slot = padf(geom["owner_local_slot"], Fp,
                            value=0).astype(np.int32)

    cell_mask = np.zeros(Cp, bool); cell_mask[:C] = True
    face_mask = np.zeros(Fp, bool); face_mask[:F] = True
    vertex_mask = np.zeros(Vp, bool); vertex_mask[:V] = True

    def field_arr(key, n_elem, n_pad):
        if key not in fields:
            return None
        x = np.asarray(fields[key], dtype=np.float32)
        # time-major (W, N, D) -> element-major (N, W, D)
        if x.ndim == 2:
            x = x[..., None]
        x = np.transpose(x, (1, 0, 2))
        assert x.shape[0] == n_elem, (key, x.shape, n_elem)
        return jnp.asarray(padf(x, n_pad), dtype=dtype)

    ft = np.asarray(geom["face_type"]).reshape(-1, 1)

    kwargs: Dict[str, Any] = dict(
        cell_pos=jnp.asarray(padf(geom["cell_pos"], Cp), dtype),
        cell_volume=jnp.asarray(padf(np.asarray(geom["cell_volume"]).reshape(-1, 1), Cp), dtype),
        cell_normal=jnp.asarray(padf(geom["cell_normal"], Cp), dtype),
        cell_edge_index=jnp.asarray(cell_edge_index),
        cell_face_sign=jnp.asarray(padf(geom["cell_face_sign"], Cp), dtype),
        face_pos=jnp.asarray(padf(geom["face_pos"], Fp), dtype),
        face_area=jnp.asarray(padf(np.asarray(geom["face_area"]).reshape(-1, 1), Fp), dtype),
        face_normal=jnp.asarray(padf(geom["face_normal"], Fp), dtype),
        face_type=jnp.asarray(padf(ft, Fp).astype(np.int32)),
        face_index=jnp.asarray(face_index),
        owner_local_slot=jnp.asarray(owner_local_slot),
        vertex_pos=jnp.asarray(padf(geom["vertex_pos"], Vp), dtype),
        vertex_edge_index=jnp.asarray(vertex_edge_index),
        vertex_face=jnp.asarray(vertex_face),
        cell_mask=jnp.asarray(cell_mask),
        face_mask=jnp.asarray(face_mask),
        vertex_mask=jnp.asarray(vertex_mask),
        face_boundary_mask=jnp.asarray(
            padf(np.asarray(geom["face_boundary_mask"]).reshape(-1).astype(bool), Fp)),
        cell_batch=jnp.zeros(Cp, jnp.int32),
        face_batch=jnp.zeros(Fp, jnp.int32),
        num_graphs=1,
        dt=jnp.asarray(dt, dtype),
        reynolds=jnp.asarray(reynolds, dtype),
        cell_velocity=field_arr("cell_velocity", C, Cp),
        cell_pressure=field_arr("cell_pressure", C, Cp),
        face_velocity=field_arr("face_velocity", F, Fp),
        face_pressure=field_arr("face_pressure", F, Fp),
        face_flux=field_arr("face_flux", F, Fp),
    )
    for loc, n, npad in (("cell", C, Cp), ("face", F, Fp)):
        wkey, nkey = f"{loc}_grad_weights", f"{loc}_grad_neighbours"
        if wkey in fields:
            kwargs[wkey] = jnp.asarray(padf(fields[wkey], npad), dtype)
            kwargs[nkey] = jnp.asarray(
                padf(fields[nkey], npad, value=(npad - 1) if npad > n else 0
                     ).astype(np.int32))
    if with_incidence:
        from gnn_fluid_dynamics_tpu.ops.segment import build_vertex_incidence
        inc = build_vertex_incidence(np.asarray(geom["vertex_edge_index"]), V,
                                     max_degree=max_degree)
        # padded incidence rows point at the padded face slot, invalid
        kwargs["vertex_inc_edge"] = jnp.asarray(
            padf(inc.edge_id, Vp, value=pad_face).astype(np.int32))
        kwargs["vertex_inc_half"] = jnp.asarray(padf(inc.half, Vp).astype(np.int32))
        kwargs["vertex_inc_valid"] = jnp.asarray(padf(inc.valid, Vp).astype(bool))
    if with_banded:
        assert Cp % 128 == 0 and Fp % 128 == 0 and Vp % 128 == 0, \
            "banded aggregation needs 128-divisible padding"
        tables = banded_tables or banded_tables_for(
            geom, {"cell": Cp, "face": Fp, "vertex": Vp})
        from gnn_fluid_dynamics_tpu.ops.banded import pad_band_width
        bp = band_pad or {}
        # bf16 tables: the 0/1 (and 1/3) weights are cheap to store at half
        # width, and the tables dominate message-passing HBM traffic
        for key, band_key, oh in (
                ("hv_onehot", "hv", tables.hv_onehot),
                ("vc_onehot", "vc", tables.vc_onehot),
                ("cf_row_onehot", "cf", tables.cf_row_onehot),
                ("cf_col_onehot", "cf", tables.cf_col_onehot),
                ("es_onehot", "es", tables.es_onehot),
                ("er_onehot", "es", tables.er_onehot),
                ("fc3_onehot", "fc3", tables.fc3_onehot)):
            B = bp.get(band_key, oh.shape[2])
            kwargs[key] = jnp.asarray(pad_band_width(oh, B), banded_dtype)
        # one (tiles, sources[, offsets]) spec entry per graph: offsets are
        # embedded statically for rollout (fast path) and carried as traced
        # int32 leaves for training (mesh-combination-independent jaxpr)
        for pre, off, T, S in (("hv", tables.hv_offsets,
                                tables.hv_onehot.shape[0], 2 * Fp),
                               ("vc", tables.vc_offsets,
                                tables.vc_onehot.shape[0], Vp),
                               ("cf", tables.cf_offsets,
                                tables.cf_row_onehot.shape[0], Cp),
                               ("es", tables.es_offsets,
                                tables.es_onehot.shape[0], Fp),
                               ("fc3", tables.fc3_offsets,
                                tables.fc3_onehot.shape[0], Fp)):
            kwargs[f"{pre}_off"] = jnp.asarray(off, jnp.int32)
            kwargs[f"{pre}_start"] = (((T, S, off),) if banded_static
                                      else ((T, S),))
    return MeshGraph(**kwargs)


def banded_tables_for(geom: Dict[str, np.ndarray], pad_to: Dict[str, int]):
    """Banded aggregation tables for ``geom`` padded to ``pad_to`` sizes —
    identical padding convention as :func:`from_geometry` (pad entries point
    at the last slot), so band widths match what the padded graph needs."""
    from gnn_fluid_dynamics_tpu.ops.banded import build_banded_tables
    C = geom["cell_pos"].shape[0]
    F = geom["face_pos"].shape[0]
    V = geom["vertex_pos"].shape[0]
    Cp, Fp, Vp = pad_to["cell"], pad_to["face"], pad_to["vertex"]

    def padi(x, n, value):
        x = np.asarray(x)
        if x.shape[1] == n:
            return x
        return np.pad(x, ((0, 0), (0, n - x.shape[1])),
                      constant_values=value)

    padded_geom = {
        "vertex_pos": np.zeros((Vp, 2)),
        "cell_pos": np.zeros((Cp, 2)),
        "vertex_edge_index": padi(geom["vertex_edge_index"], Fp,
                                  Vp - 1 if Vp > V else 0),
        "vertex_face": padi(geom["vertex_face"], Cp,
                            Vp - 1 if Vp > V else 0),
        "cell_edge_index": padi(geom["cell_edge_index"], Fp,
                                Cp - 1 if Cp > C else 0),
        "face_index": padi(geom["face_index"], Cp,
                           Fp - 1 if Fp > F else 0),
    }
    return build_banded_tables(padded_geom)


def to_static_bands(graph: MeshGraph, derive_idx: bool = True) -> MeshGraph:
    """Bake the banded offsets into the static specs (host-side, one device
    read) — call once before a rollout so band slices compile to constant
    DMA copies; leave training graphs dynamic so the jaxpr is independent of
    the batch's mesh combination. ``derive_idx=False`` skips the Pallas
    index-vector derivation (pointless host work when the consumer runs the
    XLA banded backend, e.g. the trainer's validation loop)."""
    if graph.hv_start is None:
        return graph
    import numpy as np

    kw = {}
    if not all(len(s) > 2 for s in graph.hv_start):
        def bake(specs, off):
            off = np.asarray(off)
            out, to = [], 0
            for spec in specs:
                Tp = spec[0]
                o = spec[2] if len(spec) > 2 else tuple(
                    int(x) for x in off[to: to + Tp])
                out.append((spec[0], spec[1], o))
                to += Tp
            return tuple(out)

        kw.update(hv_start=bake(graph.hv_start, graph.hv_off),
                  vc_start=bake(graph.vc_start, graph.vc_off),
                  cf_start=bake(graph.cf_start, graph.cf_off))
        if graph.es_start is not None:
            kw["es_start"] = bake(graph.es_start, graph.es_off)
        if graph.fc3_start is not None:
            kw["fc3_start"] = bake(graph.fc3_start, graph.fc3_off)

    # derive index-built selector vectors for the Pallas rollout backend
    # (valid because every table weight is exactly 1; vc's 1/3 vertex mean
    # is a kernel epilogue)
    def _col_targets(oh):
        oh = np.asarray(oh, np.float32)
        nz = oh.sum(axis=1) > 0
        return np.where(nz, oh.argmax(axis=1),
                        -1).astype(np.int32)[:, None, :]

    def _row_index(oh):
        oh = np.asarray(oh, np.float32)
        nz = oh.sum(axis=2) > 0
        return np.where(nz, oh.argmax(axis=2),
                        -1).astype(np.int32)[..., None]

    def _row_index3(oh):
        oh = np.asarray(oh, np.float32)
        order = np.argsort(-oh, axis=2, kind="stable")[:, :, :3]
        vals = np.take_along_axis(oh, order, axis=2)
        idx = np.where(vals > 0, order, -1).astype(np.int32)
        return idx[:, :, 0:1], idx[:, :, 1:2], idx[:, :, 2:3]

    if not derive_idx:
        return graph.replace(**kw) if kw else graph
    if graph.es_onehot is not None and graph.es_tgt is None:
        kw["es_tgt"] = jnp.asarray(_col_targets(graph.es_onehot))
        kw["er_tgt"] = jnp.asarray(_col_targets(graph.er_onehot))
    if graph.cf_row_onehot is not None and graph.cf_row_idx is None:
        kw["cf_row_idx"] = jnp.asarray(_row_index(graph.cf_row_onehot))
        kw["cf_col_idx"] = jnp.asarray(_row_index(graph.cf_col_onehot))
    if graph.vc_onehot is not None and graph.vc_idx0 is None:
        i0, i1, i2 = _row_index3(graph.vc_onehot)
        kw["vc_idx0"] = jnp.asarray(i0)
        kw["vc_idx1"] = jnp.asarray(i1)
        kw["vc_idx2"] = jnp.asarray(i2)
    return graph.replace(**kw) if kw else graph


def batch_graphs(graphs) -> MeshGraph:
    """Concatenate same-shape MeshGraphs into one batched graph.

    The functional analogue of PyG ``Batch.from_data_list`` used by the
    reference's DataLoader: element arrays concatenate, index arrays get offset
    by the cumulative element counts, and ``cell_batch``/``face_batch`` record
    graph membership for per-graph pooling losses (reference
    ``src/utils/loss.py:36-52, 70-89``).
    """
    assert len(graphs) > 0
    if len(graphs) == 1:
        return graphs[0]
    g0 = graphs[0]
    C, F, V = g0.num_cells, g0.num_faces, g0.num_vertices

    def cat(vals, axis=0):
        return jnp.concatenate(vals, axis=axis)

    def offset_idx(attr, per, axis=1):
        return cat([getattr(g, attr) + i * per for i, g in enumerate(graphs)],
                   axis=axis)

    n = len(graphs)
    kwargs = dict(
        cell_pos=cat([g.cell_pos for g in graphs]),
        cell_volume=cat([g.cell_volume for g in graphs]),
        cell_normal=cat([g.cell_normal for g in graphs]),
        cell_edge_index=offset_idx("cell_edge_index", C),
        cell_face_sign=cat([g.cell_face_sign for g in graphs]),
        face_pos=cat([g.face_pos for g in graphs]),
        face_area=cat([g.face_area for g in graphs]),
        face_normal=cat([g.face_normal for g in graphs]),
        face_type=cat([g.face_type for g in graphs]),
        face_index=offset_idx("face_index", F),
        owner_local_slot=cat([g.owner_local_slot for g in graphs]),
        vertex_pos=cat([g.vertex_pos for g in graphs]),
        vertex_edge_index=offset_idx("vertex_edge_index", V),
        vertex_face=offset_idx("vertex_face", V),
        cell_mask=cat([g.cell_mask for g in graphs]),
        face_mask=cat([g.face_mask for g in graphs]),
        vertex_mask=cat([g.vertex_mask for g in graphs]),
        face_boundary_mask=cat([g.face_boundary_mask for g in graphs]),
        cell_batch=cat([jnp.full((C,), i, jnp.int32) for i in range(n)]),
        face_batch=cat([jnp.full((F,), i, jnp.int32) for i in range(n)]),
        num_graphs=n,
        dt=jnp.stack([jnp.reshape(g.dt, ()) for g in graphs]),
        reynolds=jnp.stack([jnp.reshape(g.reynolds, ()) for g in graphs]),
    )
    for key in ("cell_velocity", "cell_pressure", "face_velocity",
                "face_pressure", "face_flux", "cell_grad_weights",
                "face_grad_weights", "vertex_inc_half", "vertex_inc_valid",
                "hv_off", "vc_off", "cf_off", "es_off", "fc3_off"):
        vals = [getattr(g, key) for g in graphs]
        kwargs[key] = None if vals[0] is None else cat(vals)
    # banded tables: pad band widths to the batch max, then concatenate tiles;
    # the per-graph static specs just chain (each keeps its own offsets)
    for oh_keys, spec_key in ((("hv_onehot",), "hv_start"),
                              (("vc_onehot",), "vc_start"),
                              (("cf_row_onehot", "cf_col_onehot"),
                               "cf_start"),
                              (("es_onehot", "er_onehot"), "es_start"),
                              (("fc3_onehot",), "fc3_start")):
        specs = [getattr(g, spec_key) for g in graphs]
        if specs[0] is None:
            kwargs[spec_key] = None
            for key in oh_keys:
                kwargs[key] = None
            continue
        kwargs[spec_key] = tuple(s for spec in specs for s in spec)
        B = max(getattr(g, oh_keys[0]).shape[2] for g in graphs)
        for key in oh_keys:
            vals = [getattr(g, key) for g in graphs]
            kwargs[key] = cat([
                v if v.shape[2] == B
                else jnp.pad(v, ((0, 0), (0, 0), (0, B - v.shape[2])))
                for v in vals])
    for key, per in (("cell_grad_neighbours", C), ("face_grad_neighbours", F),
                     ("vertex_inc_edge", F)):
        vals = [getattr(g, key) for g in graphs]
        kwargs[key] = None if vals[0] is None else cat(
            [v + i * per for i, v in enumerate(vals)])
    return MeshGraph(**kwargs)


def stack_graphs(graphs) -> MeshGraph:
    """Stack same-shape MeshGraphs along a new leading axis (for vmap/scan)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
