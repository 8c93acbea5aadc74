"""HDF5 dataset IO in the reference's on-disk layout.

Layout (reference ``src/datasets/DataSet.py:210-312``): one group per mesh
(``mesh_<i>``) with subgroups

* ``geom``  — canonical geometry datasets (``write_geometry`` keys)
* ``cell``  — ``velocity`` (T, C, 2), ``pressure`` (T, C, 1)
* ``face``  — ``velocity`` (T, F, 2), ``pressure`` (T, F, 1),
  optional ``flux`` (T, F, 1)
* ``meta``  — ``dt``, ``num_timesteps``, optional ``Re``
* optional ``{cell,face}_grad_weights/<order>/{weights,neighbours}``
  (reference ``src/utils/maths.py:77-91``)

so files written by this module are readable by the reference and vice versa.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from gnn_fluid_dynamics_tpu.data.pipeline import Trajectory

GEOM_KEYS = (
    "vertex_pos", "vertex_edge_index", "vertex_face", "vertex_edge_vector",
    "face_normal", "face_pos", "face_area", "face_index", "face_type",
    "face_boundary_mask", "cell_pos", "cell_edge_index", "cell_volume",
    "cell_normal",
)
# TPU-native extras not present in reference files; regenerated when missing
DERIVED_KEYS = ("cell_face_sign", "owner_local_slot")


def write_trajectory(f, mesh_id: str, geom: Dict[str, np.ndarray],
                     fields: Dict[str, np.ndarray], dt: float,
                     reynolds: Optional[float] = None):
    """Write one trajectory group (h5py file or group ``f``)."""
    g = f.create_group(mesh_id)
    gg = g.create_group("geom")
    for key in GEOM_KEYS + DERIVED_KEYS:
        if key in geom:
            gg.create_dataset(key, data=np.asarray(geom[key]))
    cell = g.create_group("cell")
    cell.create_dataset("velocity", data=fields["cell_velocity"])
    cell.create_dataset("pressure", data=fields["cell_pressure"])
    face = g.create_group("face")
    face.create_dataset("velocity", data=fields["face_velocity"])
    face.create_dataset("pressure", data=fields["face_pressure"])
    if "face_flux" in fields:
        face.create_dataset("flux", data=fields["face_flux"])
    meta = g.create_group("meta")
    meta.create_dataset("dt", data=float(dt))
    meta.create_dataset("num_timesteps",
                        data=int(fields["cell_velocity"].shape[0]))
    if reynolds is not None:
        meta.create_dataset("Re", data=float(reynolds))


def save_dataset(path: str, trajectories: Sequence[Trajectory]):
    import h5py
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        for t in trajectories:
            write_trajectory(f, t.mesh_id, t.geom, t.fields, t.dt, t.reynolds)


def _ensure_derived(geom: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Regenerate the static sign/slot tables when reading reference-written
    files that lack them."""
    if "cell_face_sign" not in geom:
        from gnn_fluid_dynamics_tpu.ops.connectivity import (
            compute_cell_face_sign, compute_owner_local_slot)
        geom["cell_face_sign"] = compute_cell_face_sign(
            geom["face_index"], geom["cell_edge_index"])
        geom["owner_local_slot"] = compute_owner_local_slot(
            geom["face_index"], geom["cell_edge_index"])
    return geom


def load_dataset(path: str, sim_limit: Optional[int] = None,
                 sim_index: Optional[Sequence[int]] = None,
                 flux_scale: float = 1.0,
                 grad_weights_order: Optional[Dict[str, int]] = None,
                 shuffle: bool = False, seed: int = 0) -> List[Trajectory]:
    """Read trajectories (reference ``DataSet._create_map`` selection
    semantics, DataSet.py:99-125).

    ``flux_scale``: the reference divides OpenFOAM's phi by 0.001 at load
    (DataSet.py:259) — pass ``1/0.001`` for OpenFOAM-generated files.
    """
    import h5py
    out = []
    with h5py.File(path, "r", swmr=True) as f:
        ids = sorted([k for k in f.keys() if k.startswith("mesh")])
        if sim_index is not None:
            ids = [f"mesh_{i}" for i in sim_index]
        elif shuffle:
            rng = np.random.default_rng(seed)
            ids = list(rng.permutation(ids))
        if sim_limit:
            assert len(ids) >= sim_limit, (len(ids), sim_limit)
            ids = ids[:sim_limit]
        for mesh_id in ids:
            g = f[mesh_id]
            geom = {k: g["geom"][k][()] for k in g["geom"].keys()}
            geom = _ensure_derived(geom)
            fields = {
                "cell_velocity": g["cell"]["velocity"][()],
                "cell_pressure": g["cell"]["pressure"][()],
                "face_velocity": g["face"]["velocity"][()],
                "face_pressure": g["face"]["pressure"][()],
            }
            if "flux" in g["face"]:
                fields["face_flux"] = g["face"]["flux"][()] * flux_scale
            grad = {}
            for loc, order in (grad_weights_order or {}).items():
                key = f"{loc}_grad_weights"
                if key in g and str(order) in g[key]:
                    sub = g[key][str(order)]
                    grad[key] = sub["weights"][()]
                    grad[f"{loc}_grad_neighbours"] = sub["neighbours"][()]
            dt = float(g["meta"]["dt"][()])
            re = float(g["meta"]["Re"][()]) if "Re" in g["meta"] else 0.0
            out.append(Trajectory(mesh_id=mesh_id, geom=geom, fields=fields,
                                  dt=dt, reynolds=re, grad_weights=grad))
    return out


# ---------------------------------------------------------------------------
# Out-of-core (lazy) loading — reference DataSet streams windows from HDF5
# with per-worker SWMR handles and an LRU geometry cache (DataSet.py:127-172).
# ---------------------------------------------------------------------------

_FIELD_PATHS = {
    "cell_velocity": ("cell", "velocity"),
    "cell_pressure": ("cell", "pressure"),
    "face_velocity": ("face", "velocity"),
    "face_pressure": ("face", "pressure"),
    "face_flux": ("face", "flux"),
}


class H5Store:
    """Shared lazy HDF5 handle + bounded LRU cache of geometry arrays.

    The file handle is (re)opened per process (SWMR), mirroring the
    reference's per-DataLoader-worker handle re-init (DataSet.py:127-149);
    geometry reads go through an LRU bounded at ``cache_entries`` arrays
    (reference: 25-mesh geometry LRU, DataSet.py:63-64, 161-172)."""

    def __init__(self, path: str, cache_entries: int = 128):
        import collections
        self.path = path
        self.cache_entries = cache_entries
        self._pid = None
        self._file = None
        self._cache = collections.OrderedDict()   # (mesh_id, key) -> ndarray
        self.hits = 0
        self.misses = 0

    @property
    def file(self):
        import h5py
        if self._file is None or self._pid != os.getpid():
            self._file = h5py.File(self.path, "r", swmr=True)
            self._pid = os.getpid()
        return self._file

    def _put(self, key, value):
        self._cache[key] = value
        self._cache.move_to_end(key)
        while len(self._cache) > self.cache_entries:
            self._cache.popitem(last=False)
        return value

    def geom_array(self, mesh_id: str, key: str) -> np.ndarray:
        ck = (mesh_id, key)
        if ck in self._cache:
            self.hits += 1
            self._cache.move_to_end(ck)
            return self._cache[ck]
        self.misses += 1
        gg = self.file[mesh_id]["geom"]
        if key in gg:
            return self._put(ck, gg[key][()])
        if key in DERIVED_KEYS:
            # regenerate the static sign/slot tables for reference-written
            # files that lack them (same as the eager loader)
            partial = {k: self.geom_array(mesh_id, k)
                       for k in ("face_index", "cell_edge_index")}
            _ensure_derived(partial)
            for k in DERIVED_KEYS:
                self._put((mesh_id, k), partial[k])
            # NOT self._cache[ck]: a tight cache_entries bound can evict ck
            # inside _put before we read it back
            return partial[key]
        raise KeyError((mesh_id, key))

    def geom_keys(self, mesh_id: str):
        return tuple(self.file[mesh_id]["geom"].keys()) + tuple(
            k for k in DERIVED_KEYS
            if k not in self.file[mesh_id]["geom"])

    def field_dataset(self, mesh_id: str, key: str):
        grp, name = _FIELD_PATHS[key]
        g = self.file[mesh_id]
        return g[grp][name] if grp in g and name in g[grp] else None


class LazyArray:
    """h5py-dataset view supporting the pipeline's access pattern
    (``x[ts]``, ``x[ts:ts+W]``, ``.shape``) with windowed disk reads."""

    def __init__(self, store: H5Store, mesh_id: str, key: str,
                 scale: float = 1.0):
        self.store = store
        self.mesh_id = mesh_id
        self.key = key
        self.scale = scale
        self.shape = store.field_dataset(mesh_id, key).shape

    def __getitem__(self, idx):
        x = self.store.field_dataset(self.mesh_id, self.key)[idx]
        return x * np.float32(self.scale) if self.scale != 1.0 else x

    def __len__(self):
        return self.shape[0]


class LazyGeom:
    """Mapping view over one mesh's geometry group, reading through the
    store's bounded LRU."""

    def __init__(self, store: H5Store, mesh_id: str):
        self.store = store
        self.mesh_id = mesh_id
        self._keys = store.geom_keys(mesh_id)

    def __getitem__(self, key):
        return self.store.geom_array(self.mesh_id, key)

    def __contains__(self, key):
        return key in self._keys

    def keys(self):
        return self._keys

    def items(self):
        return ((k, self[k]) for k in self._keys)

    def get(self, key, default=None):
        return self[key] if key in self._keys else default


class PermutedLazyArray:
    """Lazy view applying an element permutation (axis -2) on read — the
    out-of-core counterpart of ``ops.reorder.reorder_fields`` for RCM-ordered
    banded aggregation."""

    def __init__(self, base: "LazyArray", perm: np.ndarray):
        self.base = base
        self.perm = np.asarray(perm)
        self.shape = base.shape

    def __getitem__(self, idx):
        return self.base[idx][..., self.perm, :]

    def __len__(self):
        return self.shape[0]


class TransformedLazyGeom:
    """Applies a geometry transform (e.g. RCM relabeling) on demand; the
    transformed dict is cached as one entry in the store's bounded LRU."""

    def __init__(self, base: "LazyGeom", transform, tag: str):
        self.base = base
        self.transform = transform
        self.tag = tag

    def _dict(self):
        store, mid = self.base.store, self.base.mesh_id
        ck = (mid, self.tag)
        if ck in store._cache:
            store.hits += 1
            store._cache.move_to_end(ck)
            return store._cache[ck]
        store.misses += 1
        raw = {k: self.base[k] for k in self.base.keys()}
        return store._put(ck, self.transform(raw))

    def __getitem__(self, key):
        return self._dict()[key]

    def __contains__(self, key):
        return key in self._dict()

    def keys(self):
        return tuple(self._dict().keys())

    def items(self):
        return self._dict().items()

    def get(self, key, default=None):
        return self._dict().get(key, default)


def load_dataset_lazy(path: str, sim_limit: Optional[int] = None,
                      sim_index: Optional[Sequence[int]] = None,
                      flux_scale: float = 1.0,
                      grad_weights_order: Optional[Dict[str, int]] = None,
                      shuffle: bool = False, seed: int = 0,
                      cache_entries: int = 128) -> List[Trajectory]:
    """Out-of-core variant of :func:`load_dataset`: trajectories whose
    ``geom``/``fields`` are lazy HDF5 views, so the reference's 1000-mesh
    scale fits in bounded host memory (reference DataSet.py:127-172). Field
    windows are read from disk per batch; geometry flows through one shared
    bounded LRU. MLS grad-weight tables stay eager (they are small and
    feed static graph construction)."""
    import h5py
    store = H5Store(path, cache_entries=cache_entries)
    out = []
    with h5py.File(path, "r", swmr=True) as f:
        ids = sorted([k for k in f.keys() if k.startswith("mesh")])
        if sim_index is not None:
            ids = [f"mesh_{i}" for i in sim_index]
        elif shuffle:
            rng = np.random.default_rng(seed)
            ids = list(rng.permutation(ids))
        if sim_limit:
            assert len(ids) >= sim_limit, (len(ids), sim_limit)
            ids = ids[:sim_limit]
        for mesh_id in ids:
            g = f[mesh_id]
            fields = {k: LazyArray(store, mesh_id, k,
                                   scale=(flux_scale if k == "face_flux"
                                          else 1.0))
                      for k in _FIELD_PATHS
                      if store.field_dataset(mesh_id, k) is not None}
            grad = {}
            for loc, order in (grad_weights_order or {}).items():
                key = f"{loc}_grad_weights"
                if key in g and str(order) in g[key]:
                    sub = g[key][str(order)]
                    grad[key] = sub["weights"][()]
                    grad[f"{loc}_grad_neighbours"] = sub["neighbours"][()]
            dt = float(g["meta"]["dt"][()])
            re = float(g["meta"]["Re"][()]) if "Re" in g["meta"] else 0.0
            out.append(Trajectory(mesh_id=mesh_id,
                                  geom=LazyGeom(store, mesh_id),
                                  fields=fields, dt=dt, reynolds=re,
                                  grad_weights=grad))
    return out


def add_grad_weights_to_file(path: str, loc: str, poly_order: int,
                             recompute: bool = False):
    """Precompute and cache MLS weights inside the dataset file (reference
    ``MovingLeastSquaresWeights._precompute``, maths.py:49-107)."""
    import h5py
    from gnn_fluid_dynamics_tpu.ops.mls import compute_mls_weights
    with h5py.File(path, "a") as f:
        meta = f.require_group("meta")
        okey = f"{loc}_grad_weights_orders"
        existing = list(meta[okey][()]) if okey in meta else []
        if poly_order in existing and not recompute:
            return
        for mesh_id in [k for k in f.keys() if k.startswith("mesh")]:
            g = f[mesh_id]
            pos = g["geom"][f"{loc}_pos"][()]
            nb, w = compute_mls_weights(pos, poly_order)
            grp = g.require_group(f"{loc}_grad_weights")
            if str(poly_order) in grp:
                del grp[str(poly_order)]
            sub = grp.create_group(str(poly_order))
            sub.create_dataset("neighbours", data=nb)
            sub.create_dataset("weights", data=w)
        if poly_order not in existing:
            existing.append(poly_order)
            if okey in meta:
                del meta[okey]
            meta.create_dataset(okey, data=existing)
