"""Rollout output writer.

Counterpart of reference ``SimulationData`` (``src/utils/simulation_data.py``):
per-mesh HDF5 groups holding the geometry plus per-saved-timestep predictions
and ``_gt`` ground-truth datasets for cell/face velocity & pressure (+flux).
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
        """``fields`` hold stacked scan outputs (T, sum_C_padded, D); unbatch
        per mesh (padded bucket slices), subsample by ``save_frequency``, and
        write prediction + ``_gt`` datasets (reference
        simulation_data.py:96-211)."""
        Cp = self.dataset.pad_to["cell"]
        keep = list(range(0, len(timesteps), save_frequency))
        for b, mesh_id in enumerate(self.sim_ids):
            traj = self.dataset.by_id[mesh_id]
            C = traj.geom["cell_pos"].shape[0]
            g = self.file[mesh_id]
            g.create_dataset("timesteps",
                             data=np.asarray([timesteps[i] for i in keep]))
            for key, arr in fields.items():
                arr = np.asarray(arr)
                sl = arr[keep, b * Cp: b * Cp + C]
                g.create_dataset(key, data=sl)
            if ground_truth is not None:
                for key, arr in ground_truth.items():
                    arr = np.asarray(arr)
                    sl = arr[keep, b * Cp: b * Cp + C]
                    g.create_dataset(key + "_gt", data=sl)

    def close(self, meta: Optional[Dict] = None, meta_path: Optional[str] = None):
        if meta_path:
            meta = dict(meta or {})
            meta["run_time"] = time.time() - self.start_time
            with open(meta_path, "w") as f:
                json.dump(meta, f, indent=2, default=str)
        self.file.close()
