"""Host-side data pipeline: trajectory store, sample map, padded batching.

The reference streams (mesh, timestep) windows out of HDF5 through PyG
DataLoader workers (``src/datasets/DataSet.py``, ``src/utils/sampler.py``).
On TPU the goal is fixed-shape device buffers and a tiny number of jit shapes,
so the pipeline here:

* keeps each trajectory in host memory (numpy, time-major) — meshes are a few
  MB; 50 sims x 400 steps of the reference workload fit comfortably;
* pads every mesh to one shared bucket shape, builds the static batched
  geometry graph ONCE per (batch-size, bucket) pair, and per step only swaps
  the time-window field arrays in — a single host->HBM transfer per batch;
* implements the reference's stride/window/bundling sample-map logic
  (``DataSet.py:71-125``) and its sampler orders: random batches for training,
  timestep-major rollout order (``sampler.py:5-46``).
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_fluid_dynamics_tpu.graph import MeshGraph, batch_graphs, from_geometry
from gnn_fluid_dynamics_tpu.ops.mls import compute_mls_weights

FIELD_KEYS = ("cell_velocity", "cell_pressure", "face_velocity",
              "face_pressure", "face_flux")


@dataclasses.dataclass
class Trajectory:
    """One mesh + its time series (time-major numpy arrays)."""
    mesh_id: str
    geom: Dict[str, np.ndarray]
    fields: Dict[str, np.ndarray]          # key -> (T, N, D)
    dt: float = 0.01
    reynolds: float = 0.0
    grad_weights: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_timesteps(self) -> int:
        return self.fields["cell_velocity"].shape[0]


def compute_window(timestep_stride: Optional[int],
                   pushforward_factor: Optional[int],
                   bundle_size: Optional[int],
                   mode: str = "train") -> Tuple[int, int]:
    """(stride, data_window) per the reference's precedence
    (``DataSet.py:71-89``)."""
    if timestep_stride:
        stride, window = timestep_stride, timestep_stride + 1
    else:
        stride, window = 1, 2
    if pushforward_factor:
        stride, window = 1, pushforward_factor + 2
    if bundle_size:
        window = bundle_size + 1
        if mode == "rollout":
            stride = bundle_size
    return stride, window


class MeshDataset:
    """In-memory dataset over a set of trajectories with one shared padded
    bucket. The analogue of reference ``DataSet`` minus file handles."""

    def __init__(self, trajectories: Sequence[Trajectory],
                 stride: int = 1, data_window: int = 2,
                 timestep_range: Optional[Tuple[int, int]] = None,
                 pad_multiple: int = 128,
                 with_incidence: bool = False,
                 with_banded: bool = False,
                 banded_dtype="float32",
                 num_buckets: int = 1,
                 max_cached_graphs: Optional[int] = None):
        assert trajectories
        # out-of-core mode: when max_cached_graphs is set, per-mesh static
        # graphs and banded tables live in LRU caches of that size instead of
        # being pinned for every mesh — pair with hdf5.load_dataset_lazy so
        # the reference's 1000-mesh scale runs in bounded memory
        # (reference DataSet.py:127-172)
        self.max_cached_graphs = max_cached_graphs
        self.trajectories = list(trajectories)
        self.by_id = {t.mesh_id: t for t in self.trajectories}
        self.stride = stride
        self.data_window = data_window
        if with_banded and pad_multiple % 128:
            pad_multiple = 128
        self.pad_multiple = pad_multiple
        self.with_incidence = with_incidence
        self.with_banded = with_banded
        self.banded_dtype = banded_dtype

        def rup(n):
            m = max(pad_multiple, 1)
            return ((n + m - 1) // m) * m

        # size bucketing (SURVEY.md §7 "hard parts"): meshes grouped by cell
        # count into num_buckets padded shapes so jit caches stay small while
        # padding waste shrinks on heterogeneous datasets
        num_buckets = min(num_buckets, len(self.trajectories))
        sizes = np.array([t.geom["cell_pos"].shape[0]
                          for t in self.trajectories])
        order = np.argsort(sizes, kind="stable")
        splits = np.array_split(order, max(num_buckets, 1))
        self.bucket_of: Dict[str, int] = {}
        self.bucket_pad: List[Dict[str, int]] = []
        for b, idxs in enumerate(splits):
            members = [self.trajectories[i] for i in idxs]
            self.bucket_pad.append({
                "cell": rup(max(t.geom["cell_pos"].shape[0] for t in members)),
                "face": rup(max(t.geom["face_pos"].shape[0] for t in members)),
                "vertex": rup(max(t.geom["vertex_pos"].shape[0] for t in members)),
            })
            for t in members:
                self.bucket_of[t.mesh_id] = b
        # single-bucket view kept for rollout-style all-mesh batches
        self.pad_to = {
            "cell": rup(max(t.geom["cell_pos"].shape[0] for t in self.trajectories)),
            "face": rup(max(t.geom["face_pos"].shape[0] for t in self.trajectories)),
            "vertex": rup(max(t.geom["vertex_pos"].shape[0] for t in self.trajectories)),
        }

        num_ts = min(t.num_timesteps for t in self.trajectories)
        if timestep_range:
            start, end = timestep_range[:2]
            assert num_ts >= end - 2 + data_window, (num_ts, end, data_window)
        else:
            start, end = 0, num_ts - data_window + 1
        # (mesh, ts) sample map, timestep-major like the reference
        # (DataSet.py:123-125)
        self.sample_map: List[Tuple[str, int]] = [
            (t.mesh_id, ts)
            for ts in range(start, end, stride)
            for t in self.trajectories
        ]
        self.timestep_range = (start, end)

        self._static_graphs: "OrderedDict[Tuple, MeshGraph]" = OrderedDict()
        # bounded: every distinct mesh combination would otherwise pin a
        # full batched graph (geometry + banded tables) in HBM — with random
        # multi-mesh batches that exhausts device memory
        self._batched_cache: Dict[Tuple[str, ...], MeshGraph] = {}
        self._batched_cache_size = 8

        # banded tables are CANONICALIZED per bucket: every mesh sharing a
        # padded shape gets identical per-tile band offsets, so banded specs
        # are static (constant-slice fast path) yet independent of which
        # meshes share a batch — one compile per bucket shape instead of one
        # per mesh combination. In-memory mode builds+pins every mesh's
        # tables eagerly; out-of-core mode streams a metadata pass (tables
        # discarded) and rebuilds per-mesh tables on demand into the LRU.
        self._tables_cache: "OrderedDict[Tuple, Any]" = OrderedDict()
        self._canon_specs: Dict[Tuple, Any] = {}
        self._canon_done: set = set()
        if with_banded:
            for b, pad in enumerate(self.bucket_pad):
                members = [t.mesh_id for t in self.trajectories
                           if self.bucket_of[t.mesh_id] == b]
                self._ensure_canon(pad, members)

    @staticmethod
    def _pad_key(pad: Dict[str, int]) -> Tuple[int, int, int]:
        return (pad["cell"], pad["face"], pad["vertex"])

    def _build_tables(self, mesh_id: str, pad: Dict[str, int]):
        from gnn_fluid_dynamics_tpu.graph import banded_tables_for
        return banded_tables_for(self.by_id[mesh_id].geom, pad)

    def _tables_put(self, key, value):
        self._tables_cache[key] = value
        self._tables_cache.move_to_end(key)
        if self.max_cached_graphs is not None:
            while len(self._tables_cache) > self.max_cached_graphs:
                self._tables_cache.popitem(last=False)
        return value

    def _ensure_canon(self, pad: Dict[str, int], members):
        from gnn_fluid_dynamics_tpu.ops.banded import (canonical_spec,
                                                       rebase_tables,
                                                       table_meta)
        pk = self._pad_key(pad)
        key = ("canon",) + pk + (frozenset(members),)
        if key in self._canon_done:
            return
        if len(members) == 1:
            spec = None                       # single mesh: tables as built
        elif self.max_cached_graphs is None:
            tbls = [self._build_tables(m, pad) for m in members]
            spec = canonical_spec([table_meta(t) for t in tbls])
            for m, t in zip(members, tbls):
                self._tables_put((m,) + pk, rebase_tables(t, spec))
        else:
            # streaming metadata pass: per-mesh tables built, summarized,
            # and discarded — memory stays bounded at one mesh's tables
            spec = canonical_spec(
                [table_meta(self._build_tables(m, pad)) for m in members])
        if pk in self._canon_specs:
            # the spec for this pad widened (e.g. bucket pad == global
            # rollout pad but the member set grew): tables/graphs rebased
            # against the old spec no longer share offsets with new ones
            for k in [k for k in self._tables_cache if k[1:] == pk]:
                del self._tables_cache[k]
            for k in [k for k in self._static_graphs if k[1:] == pk]:
                del self._static_graphs[k]
            self._batched_cache.clear()
        self._canon_specs[pk] = spec
        self._canon_done.add(key)

    def _tables_for(self, mesh_id: str, pad: Dict[str, int]):
        from gnn_fluid_dynamics_tpu.ops.banded import rebase_tables
        pk = self._pad_key(pad)
        key = (mesh_id,) + pk
        if key in self._tables_cache:
            self._tables_cache.move_to_end(key)
            return self._tables_cache[key]
        t = self._build_tables(mesh_id, pad)
        spec = self._canon_specs.get(pk)
        return self._tables_put(key, rebase_tables(t, spec) if spec else t)

    def _canon_tables(self, mesh_id: str, pad: Dict[str, int]):
        """Canonicalized tables for this mesh at these pad sizes; for pad
        sets outside the buckets (the all-mesh rollout pad), canonicalize
        across every trajectory on first use."""
        all_ids = [t.mesh_id for t in self.trajectories]
        b = self.bucket_of[mesh_id]
        bucket_ids = [t.mesh_id for t in self.trajectories
                      if self.bucket_of[t.mesh_id] == b]
        if pad != self.bucket_pad[b] or (
                ("canon",) + self._pad_key(pad) + (frozenset(bucket_ids),)
                not in self._canon_done):
            self._ensure_canon(pad, all_ids)
        return self._tables_for(mesh_id, pad)

    def __len__(self):
        return len(self.sample_map)

    def sim_ids(self) -> List[str]:
        return [t.mesh_id for t in self.trajectories]

    # ---- static geometry ---------------------------------------------------
    def _pad_for(self, mesh_ids) -> Dict[str, int]:
        buckets = {self.bucket_of[m] for m in mesh_ids}
        if len(buckets) == 1:
            return self.bucket_pad[buckets.pop()]
        return self.pad_to

    def _static_graph(self, mesh_id: str, pad: Dict[str, int]) -> MeshGraph:
        key = (mesh_id, pad["cell"], pad["face"], pad["vertex"])
        if key not in self._static_graphs:
            t = self.by_id[mesh_id]
            self._static_graphs[key] = from_geometry(
                t.geom, fields=t.grad_weights, dt=t.dt * self.stride,
                reynolds=t.reynolds, pad_to=pad,
                with_incidence=self.with_incidence,
                with_banded=self.with_banded,
                banded_dtype=jnp.dtype(self.banded_dtype),
                banded_static=True,
                banded_tables=(self._canon_tables(mesh_id, pad)
                               if self.with_banded else None))
            if self.max_cached_graphs is not None:
                while len(self._static_graphs) > self.max_cached_graphs:
                    self._static_graphs.popitem(last=False)
        else:
            self._static_graphs.move_to_end(key)
        return self._static_graphs[key]

    def _batched_static(self, mesh_ids: Tuple[str, ...]) -> MeshGraph:
        if mesh_ids not in self._batched_cache:
            pad = self._pad_for(mesh_ids)
            if self.with_banded and len(
                    {self.bucket_of[m] for m in mesh_ids}) > 1:
                # pre-ensure the canon spec for this pad across ALL meshes
                # BEFORE building member graphs: a later member's
                # _canon_tables may otherwise widen the spec mid-batch and
                # invalidate graphs already built for earlier members,
                # mixing band offsets inside one batch
                self._ensure_canon(pad, [t.mesh_id for t in self.trajectories])
            while len(self._batched_cache) >= self._batched_cache_size:
                self._batched_cache.pop(next(iter(self._batched_cache)))
            self._batched_cache[mesh_ids] = batch_graphs(
                [self._static_graph(m, pad) for m in mesh_ids])
        return self._batched_cache[mesh_ids]

    # ---- field windows -----------------------------------------------------
    def _window(self, mesh_id: str, ts: int,
                pad: Dict[str, int]) -> Dict[str, np.ndarray]:
        t = self.by_id[mesh_id]
        out = {}
        for key in FIELD_KEYS:
            if key not in t.fields:
                continue
            arr = t.fields[key][ts:ts + self.data_window]       # (W, N, D)
            npad = pad["cell" if key.startswith("cell") else "face"]
            x = np.transpose(arr, (1, 0, 2))                    # (N, W, D)
            if x.shape[0] < npad:
                x = np.pad(x, ((0, npad - x.shape[0]), (0, 0), (0, 0)))
            out[key] = x
        return out

    def get_batch(self, samples: Sequence[Tuple[str, int]]) -> MeshGraph:
        """Assemble one batched MeshGraph for [(mesh_id, ts), ...]."""
        mesh_ids = tuple(m for m, _ in samples)
        g = self._batched_static(mesh_ids)
        pad = self._pad_for(mesh_ids)
        winds = [self._window(m, ts, pad) for m, ts in samples]
        updates = {}
        for key in FIELD_KEYS:
            if key in winds[0]:
                arr = np.concatenate([w[key] for w in winds], axis=0)
                # NOTE: the reference's 1/0.001 OpenFOAM flux scaling
                # (DataSet.py:259) is applied in the HDF5 loader, not here —
                # trajectories store flux in internal units.
                updates[key] = jnp.asarray(arr)
        return g.replace(**updates)

    def get_item(self, idx: int) -> MeshGraph:
        return self.get_batch([self.sample_map[idx]])

    def get_batch_stack(self, sample_batches: Sequence[Sequence[Tuple[str, int]]]
                        ) -> Tuple[MeshGraph, Dict[str, jax.Array]]:
        """Assemble ``k`` consecutive batches that share ONE mesh combination
        as (static batched graph, {field: (k, N, W, D)}) — the input of the
        trainer's scan-fused multi-step path. The static graph (geometry +
        banded tables) is built/transferred once per combination and reused
        from the batched cache; only the stacked field windows move per call."""
        mesh_ids = tuple(m for m, _ in sample_batches[0])
        assert all(tuple(m for m, _ in sb) == mesh_ids
                   for sb in sample_batches), "batches must share a mesh combo"
        g = self._batched_static(mesh_ids)
        pad = self._pad_for(mesh_ids)
        per_key: Dict[str, list] = {}
        for sb in sample_batches:
            winds = [self._window(m, ts, pad) for m, ts in sb]
            for key in FIELD_KEYS:
                if key in winds[0]:
                    per_key.setdefault(key, []).append(
                        np.concatenate([w[key] for w in winds], axis=0))
        stack = {key: jnp.asarray(np.stack(v)) for key, v in per_key.items()}
        return g, stack

    # ---- device-resident trajectory fields ----------------------------------
    def estimate_device_field_bytes(self) -> int:
        """Total bytes the full dataset's trajectory fields occupy when
        device-resident (padded, f32) — the budget check for the
        indexed training path."""
        total = 0
        for t in self.trajectories:
            pad = self.bucket_pad[self.bucket_of[t.mesh_id]]
            for key, arr in t.fields.items():
                if key not in FIELD_KEYS:
                    continue
                npad = pad["cell" if key.startswith("cell") else "face"]
                total += arr.shape[0] * npad * arr.shape[2] * 4
        return total

    def device_fields(self, mesh_ids: Tuple[str, ...]) -> Dict[str, jax.Array]:
        """Full trajectory fields for one mesh combination as device arrays
        ``{key: (T, B*Npad, D)}`` in batch layout, LRU-cached per combination.

        With a fixed-chunk sampler each combination transfers ONCE for the
        whole run; the scan-fused indexed train step then gathers its
        (N, W, D) windows on device from per-step timestep indices instead of
        shipping assembled field stacks from the host every call."""
        if not hasattr(self, "_device_fields_cache"):
            self._device_fields_cache = OrderedDict()
            self._device_fields_cache_size = 16
        cache = self._device_fields_cache
        if mesh_ids in cache:
            cache.move_to_end(mesh_ids)
            return cache[mesh_ids]
        pad = self._pad_for(mesh_ids)
        T = min(self.by_id[m].num_timesteps for m in mesh_ids)
        out = {}
        for key in FIELD_KEYS:
            if not all(key in self.by_id[m].fields for m in mesh_ids):
                continue
            npad = pad["cell" if key.startswith("cell") else "face"]
            rows = []
            for m in mesh_ids:
                x = np.asarray(self.by_id[m].fields[key][:T])
                rows.append(np.pad(x, ((0, 0), (0, npad - x.shape[1]), (0, 0))))
            out[key] = jnp.asarray(np.concatenate(rows, axis=1))
        while len(cache) >= self._device_fields_cache_size:
            cache.popitem(last=False)
        cache[mesh_ids] = out
        return out

    # ---- rollout ground truth ----------------------------------------------
    def trajectory_fields(self, mesh_ids: Sequence[str], t0: int,
                          num_steps: int,
                          keys: Sequence[str] = FIELD_KEYS
                          ) -> Dict[str, np.ndarray]:
        """Padded/batched ground-truth stacks (T, sum_N, D) for every
        requested field present in all trajectories, aligned like
        :meth:`trajectory_targets` (row i == state at t0 + (i+1)*stride).
        Cell keys pad to the cell bucket, face keys to the face bucket —
        the face fields feed the full-fidelity rollout writer (reference
        ``simulation_data.py:96-211``)."""
        pad = self._pad_for(mesh_ids)
        keys = [k for k in keys
                if all(k in self.by_id[m].fields for m in mesh_ids)]
        out: Dict[str, List[np.ndarray]] = {k: [] for k in keys}
        for i in range(num_steps):
            ts = t0 + (i + 1) * self.stride
            for k in keys:
                npad = pad["cell" if k.startswith("cell") else "face"]
                rows = []
                for m in mesh_ids:
                    x = self.by_id[m].fields[k][ts]
                    rows.append(np.pad(x, ((0, npad - x.shape[0]), (0, 0))))
                out[k].append(np.concatenate(rows, axis=0))
        return {k: np.stack(v) for k, v in out.items()}

    def trajectory_targets(self, mesh_ids: Sequence[str], t0: int,
                           num_steps: int) -> Tuple[jax.Array, jax.Array]:
        """(T, sum_C, 2) cell velocity + (T, sum_C, 1) pressure ground truth,
        padded/batched to match a ``get_batch`` graph; row i == state at
        t0 + (i+1)*stride."""
        f = self.trajectory_fields(mesh_ids, t0, num_steps,
                                   keys=("cell_velocity", "cell_pressure"))
        return jnp.asarray(f["cell_velocity"]), jnp.asarray(f["cell_pressure"])

    # ---- MLS weights -------------------------------------------------------
    def add_grad_weights(self, loc: str, poly_order: int):
        """Precompute MLS weights per mesh (reference
        ``MovingLeastSquaresWeights.add_weights_to_dataset``, maths.py:34-107)."""
        for t in self.trajectories:
            wkey = f"{loc}_grad_weights"
            if wkey in t.grad_weights:
                continue
            nb, w = compute_mls_weights(t.geom[f"{loc}_pos"], poly_order)
            t.grad_weights[wkey] = w
            t.grad_weights[f"{loc}_grad_neighbours"] = nb
        self._static_graphs.clear()
        self._batched_cache.clear()


def train_batches(dataset: MeshDataset, batch_size: int, rng: np.random.Generator):
    """Yield shuffled training batches of (mesh_id, ts) samples (drop last).
    With size bucketing, every batch stays within one bucket (one jit shape
    per bucket) and bucket order is shuffled."""
    by_bucket: Dict[int, list] = {}
    for sample in dataset.sample_map:
        by_bucket.setdefault(dataset.bucket_of[sample[0]], []).append(sample)
    batches = []
    for samples in by_bucket.values():
        order = rng.permutation(len(samples))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batches.append([samples[j] for j in order[i:i + batch_size]])
    for i in rng.permutation(len(batches)):
        yield batches[i]


def prefetch(batch_iter, dataset: MeshDataset, size: int = 2):
    """Double-buffered host->device prefetch (SURVEY.md §7): a background
    thread assembles + transfers the next batches while the device computes
    the current one. Yields MeshGraph batches."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    SENTINEL = object()

    def worker():
        try:
            for samples in batch_iter:
                q.put(dataset.get_batch(samples))
        finally:
            q.put(SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is SENTINEL:
            break
        yield item


def prefetch_grouped(batch_iter, dataset: MeshDataset, k: int,
                     size: int = 2):
    """Grouped double-buffered prefetch for the scan-fused train step.

    Collects runs of consecutive sample-batches that share a mesh
    combination (what ``balanced_chunked`` emits) into groups of exactly
    ``k`` and assembles them via :meth:`MeshDataset.get_batch_stack`; runs
    shorter than ``k`` (chunk tails, combo changes) fall back to plain
    batches. Yields ``("multi", graph, field_stack)`` or
    ``("single", graph)``."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    SENTINEL = object()

    def assemble(run):
        while len(run) >= k:
            group, rest = run[:k], run[k:]
            g, stack = dataset.get_batch_stack(group)
            q.put(("multi", g, stack))
            run = rest
        for samples in run:
            q.put(("single", dataset.get_batch(samples)))

    def worker():
        try:
            run, cur = [], None
            for samples in batch_iter:
                ids = tuple(m for m, _ in samples)
                if ids != cur:
                    assemble(run)
                    run, cur = [], ids
                run.append(samples)
                if len(run) == k:
                    assemble(run)
                    run = []
            assemble(run)
        finally:
            q.put(SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is SENTINEL:
            break
        yield item


def prefetch_indexed(batch_iter, dataset: MeshDataset, k: int):
    """Index-driven grouping for the device-resident train path.

    Like :func:`prefetch_grouped`, collects runs of consecutive sample
    batches sharing one mesh combination — but instead of assembling host
    field stacks it yields ``("indexed", graph, dev_fields, ts)`` where
    ``dev_fields`` is the combination's device-resident full trajectory
    store (:meth:`MeshDataset.device_fields`) and ``ts`` is the (k', B)
    int32 timestep-index array, k' <= k. Host work per fused call is one
    tiny index array; no background thread is needed."""
    run, cur = [], None

    def emit(run):
        while run:
            group, run = run[:k], run[k:]
            g = dataset._batched_static(cur)
            dev = dataset.device_fields(cur)
            ts = np.asarray([[t for _, t in sb] for sb in group], np.int32)
            yield ("indexed", g, dev, ts)

    for samples in batch_iter:
        ids = tuple(m for m, _ in samples)
        if ids != cur:
            yield from emit(run)
            run, cur = [], ids
        run.append(samples)
        if len(run) == k:
            yield from emit(run)
            run = []
    yield from emit(run)


def rollout_batch(dataset: MeshDataset, t0: Optional[int] = None):
    """The rollout initial batch: all trajectories at the range start
    (reference ``RolloutSampler`` ordering, sampler.py:5-46)."""
    t0 = dataset.timestep_range[0] if t0 is None else t0
    return [(m, t0) for m in dataset.sim_ids()]
