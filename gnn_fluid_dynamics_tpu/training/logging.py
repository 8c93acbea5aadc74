"""Metrics logging / observability.

Functional mirror of the reference ``Logger`` (``src/utils/logging.py:32-366``):
run naming (project/group/name-timestamp), flat-config + git metadata capture,
scalar/loss/plot/snapshot logging, debug-mode safety. wandb and TensorBoard
are optional sinks (wandb gated for zero-egress environments; TensorBoard via
tf.summary event files); every metric always lands in ``metrics.jsonl`` so
runs are inspectable without external services.
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np


def git_metadata() -> Dict[str, str]:
    """Commit/branch/dirty capture (reference ``Logger._check_git``,
    logging.py:65-104 — without the interactive dirty-repo prompt, which a
    TPU batch job cannot answer; dirtiness is recorded instead)."""
    def run(*args):
        try:
            return subprocess.run(["git", *args], capture_output=True,
                                  text=True, timeout=5).stdout.strip()
        except Exception:
            return ""
    return {
        "commit": run("rev-parse", "HEAD"),
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
    }


class Logger:
    """Experiment logger: directories, JSONL metrics, optional wandb."""

    def __init__(self, config, base_dir: str = "runs",
                 use_wandb: Optional[bool] = None, resume_wandb_id=None):
        self.config = config
        self.check_debug_mode_safety()
        stamp = datetime.now().strftime("%m%d%H%M%S")
        name = config.logging.name or "run"
        self.name = f"{name}({stamp})"
        self.directory = os.path.join(
            base_dir, config.logging.project or "default",
            config.logging.group or "default", self.name)
        os.makedirs(self.directory, exist_ok=True)
        self._metrics_path = os.path.join(self.directory, "metrics.jsonl")
        self._metrics_file = open(self._metrics_path, "a")

        with open(os.path.join(self.directory, "config.json"), "w") as f:
            json.dump({"config": config.to_dict(), "git": git_metadata(),
                       "flat": config.to_flat_dict()}, f, indent=2, default=str)

        self.wandb = None
        want_wandb = (config.logging.use_wandb if use_wandb is None else use_wandb)
        if want_wandb:
            try:                                     # zero-egress safe
                import wandb
                self.wandb = wandb.init(
                    project=config.logging.project or None,
                    group=config.logging.group or None,
                    name=self.name, id=resume_wandb_id,
                    resume="must" if resume_wandb_id else None,
                    config=config.to_flat_dict())
            except Exception as e:                   # pragma: no cover
                print(f"wandb unavailable ({e}); falling back to JSONL only")
                self.wandb = None

        # TensorBoard (reference logging.py:147-177 leaves this a stub; here
        # it is real): tf.summary event files under <run>/tb, scalars only
        self.tb = None
        if config.logging.use_tensorboard:
            try:
                import tensorflow as tf
                self.tb = tf.summary.create_file_writer(
                    os.path.join(self.directory, "tb"))
            except Exception as e:                   # pragma: no cover
                print(f"tensorboard unavailable ({e}); JSONL only")
                self.tb = None
        self.norm_stats = None

    def check_debug_mode_safety(self):
        """Refuse silently-unlogged long runs (reference logging.py:53-63)."""
        if self.config.logging.is_debug and self.config.training.epochs > 5:
            raise RuntimeError(
                "debug mode with a long run would go unlogged; disable "
                "is_debug or shorten the run")

    def set_norm_stats(self, stats):
        self.norm_stats = stats

    # ---- metric sinks -------------------------------------------------------
    def _emit(self, record: Dict[str, Any]):
        record["ts"] = time.time()
        self._metrics_file.write(json.dumps(record, default=float) + "\n")
        self._metrics_file.flush()
        if self.wandb is not None:
            step = record.pop("step", None)
            self.wandb.log({k: v for k, v in record.items() if k != "ts"},
                           step=step)
        if self.tb is not None:
            import tensorflow as tf
            step = int(record.get("step", 0))
            with self.tb.as_default():
                for k, v in record.items():
                    if k in ("step", "ts") or not isinstance(v, (int, float)):
                        continue
                    tf.summary.scalar(k, v, step=step)

    def save_loss(self, losses: Dict[str, float], step: int, prefix: str):
        """(reference logging.py:195-211)"""
        self._emit({f"{prefix}/{k}": float(v) for k, v in losses.items()}
                   | {"step": step})

    def save_scalar(self, value: float, step: int, prefix: str):
        self._emit({prefix: float(value), "step": step})

    def save_plot(self, values, step: int, prefix: str):
        """Line-series logging (reference logging.py:213-232): stored as the
        raw array in JSONL; rendered by analysis tooling."""
        self._emit({prefix: list(map(float, values)), "step": step})

    def save_plots(self, arrays: Dict[str, Dict[str, list]], step: int,
                   prefix: str):
        for name, series in arrays.items():
            for key, values in series.items():
                self.save_plot(values, step, f"{prefix}/{name}/{key}")

    def save_snapshot(self, snapshot_data: Dict, step: int, prefix: str):
        """Velocity-field snapshots (reference logging.py:234-270): raw arrays
        as .npz always; rendered |u| tripcolor PNGs when matplotlib is
        importable (headless Agg backend)."""
        if not snapshot_data:
            return
        snap_dir = os.path.join(self.directory, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        for timestep, meshes in snapshot_data.items():
            out = {}
            for mesh, payload in meshes.items():
                for key, arr in payload.items():
                    out[f"{mesh}/{key}"] = np.asarray(arr)
            np.savez(os.path.join(snap_dir, f"step{step}_t{timestep}.npz"),
                     **out)
            self._render_snapshot(meshes, snap_dir, step, timestep)

    @staticmethod
    def _render_snapshot(meshes: Dict, snap_dir: str, step, timestep):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import matplotlib.tri as mtri
        except ImportError:                       # pragma: no cover
            return
        n = len(meshes)
        fig, axes = plt.subplots(n, 1, figsize=(8, 3 * n), squeeze=False)
        for ax, (mesh, payload) in zip(axes[:, 0], meshes.items()):
            pos = np.asarray(payload["vertex_pos"])
            tris = np.asarray(payload["vertex_face"]).T
            field = np.asarray(payload["field_data"])
            speed = np.linalg.norm(field, axis=-1) if field.ndim == 2 \
                else field
            tri = mtri.Triangulation(pos[:, 0], pos[:, 1], tris)
            # cell-valued field -> facecolors per triangle
            tpc = ax.tripcolor(tri, facecolors=speed[: tris.shape[0]],
                               cmap="viridis")
            fig.colorbar(tpc, ax=ax, label="|u|")
            ax.set_aspect("equal")
            ax.set_title(f"{mesh} t={timestep}")
        fig.tight_layout()
        fig.savefig(os.path.join(snap_dir, f"step{step}_t{timestep}.png"),
                    dpi=100)
        plt.close(fig)

    def close(self):
        self._metrics_file.close()
        if self.wandb is not None:
            self.wandb.finish()
        if self.tb is not None:
            self.tb.close()
