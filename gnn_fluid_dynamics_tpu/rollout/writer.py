"""Rollout output writer.

Counterpart of reference ``SimulationData`` (``src/utils/simulation_data.py``):
per-mesh HDF5 groups holding the geometry plus per-saved-timestep predictions
and ``_gt`` ground-truth datasets, in the reference's exact layout
(simulation_data.py:59-119):

    <mesh_id>/geom/{vertex_pos, cell_pos, face_area, ...}
    <mesh_id>/cell/{velocity, pressure, flux, velocity_gt, pressure_gt}
    <mesh_id>/face/{velocity, pressure, flux, velocity_gt, pressure_gt, flux_gt}
    <mesh_id>/timesteps

The TPU rollout produces whole stacked trajectories from the scan, so writing
is one bulk unbatch+slice pass after the device work finishes instead of
per-step h5py writes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np


def _split_key(key: str):
    """'face_velocity' -> ('face', 'velocity'); 'cell_flux' -> ('cell', 'flux')."""
    entity, _, name = key.partition("_")
    assert entity in ("cell", "face") and name, key
    return entity, name


class SimulationWriter:
    """Write rollout results (+ ground truth) in the reference's layout."""

    def __init__(self, path: str, dataset, sim_ids: Sequence[str]):
        import h5py
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.file = h5py.File(path, "w")
        self.dataset = dataset
        self.sim_ids = list(sim_ids)
        self.start_time = time.time()
        for mesh_id in self.sim_ids:
            traj = dataset.by_id[mesh_id]
            g = self.file.create_group(mesh_id)
            gg = g.create_group("geom")
            for key, value in traj.geom.items():
                gg.create_dataset(key, data=np.asarray(value))

    def write_fields(self, fields: Dict[str, np.ndarray],
                     timesteps: Sequence[int],
                     ground_truth: Optional[Dict[str, np.ndarray]] = None,
                     save_frequency: int = 1):
        """``fields``/``ground_truth`` hold stacked scan outputs keyed
        ``{cell,face}_{velocity,pressure,flux}`` of shape (T, sum_N_padded, D);
        unbatch per mesh (padded bucket slices), subsample by
        ``save_frequency``, and write prediction + ``_gt`` datasets under the
        reference's ``cell/``/``face/`` groups (simulation_data.py:96-211)."""
        # must match the padding get_batch used for this sim batch (a single
        # bucket collapses to its bucket pad, not the global pad)
        pad = self.dataset._pad_for(self.sim_ids)
        keep = list(range(0, len(timesteps), save_frequency))
        for b, mesh_id in enumerate(self.sim_ids):
            traj = self.dataset.by_id[mesh_id]
            counts = {"cell": traj.geom["cell_pos"].shape[0],
                      "face": traj.geom["face_pos"].shape[0]}
            g = self.file[mesh_id]
            g.create_dataset("timesteps",
                             data=np.asarray([timesteps[i] for i in keep]))
            items = [(key, arr, "") for key, arr in fields.items()]
            if ground_truth is not None:
                items += [(key, arr, "_gt") for key, arr in ground_truth.items()]
            for key, arr, suffix in items:
                entity, name = _split_key(key)
                Np = pad[entity]
                arr = np.asarray(arr)
                sl = arr[keep, b * Np: b * Np + counts[entity]]
                grp = g.require_group(entity)
                grp.create_dataset(name + suffix, data=sl.astype("f4"))

    def close(self, meta: Optional[Dict] = None, meta_path: Optional[str] = None):
        if meta_path:
            meta = dict(meta or {})
            meta["run_time"] = time.time() - self.start_time
            with open(meta_path, "w") as f:
                json.dump(meta, f, indent=2, default=str)
        self.file.close()
