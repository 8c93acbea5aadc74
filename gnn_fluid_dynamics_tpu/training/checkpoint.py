"""Checkpoint / resume.

Reference semantics (``src/utils/logging.py:272-340`` + ``src/utils/
model_loading.py``): a checkpoint embeds model/optimizer state, training
counters, the FULL config, and the normalization stats, so rollout is
self-contained; retention keeps "latest" plus "best by validation error" and
cleans the rest. Here the train-state pytree goes through Orbax; config/stats/
counters ride along as JSON metadata in the same checkpoint directory.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except Exception:                                    # pragma: no cover
    HAVE_ORBAX = False


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Checkpointer:
    """Save/restore train state + config + stats with latest/best retention."""

    def __init__(self, directory: str, save_overwrite: bool = True,
                 keep_best: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_best = keep_best
        self.best_error = float("inf")
        # restore the best error across resumes so a worse post-resume save
        # can't demote the recorded best
        best_ptr = os.path.join(self.directory, "best.json")
        if os.path.exists(best_ptr):
            try:
                with open(best_ptr) as f:
                    self.best_error = float(json.load(f).get("error", "inf"))
            except (ValueError, OSError):
                pass
        self._ckptr = ocp.StandardCheckpointer() if HAVE_ORBAX else None

    # ---- save ---------------------------------------------------------------
    def save(self, state, trainer, train_losses: Optional[Dict] = None,
             valid_losses: Optional[Dict] = None):
        """Cadence-driven save (reference Logger.save_model, logging.py:272-340):
        writes 'checkpoint-<mini_epoch>', refreshes the 'latest' pointer, and
        promotes to 'best' when the validation error improves."""
        tag = f"checkpoint-{trainer.mini_epoch_count}"
        path = os.path.join(self.directory, tag)
        meta = {
            "epoch": trainer.epoch_count,
            "mini_epoch": trainer.mini_epoch_count,
            "step": trainer.step_count,
            "sample_count": trainer.sample_count,
            "config": trainer.config.to_dict(),
            "train_losses": {k: float(v) for k, v in (train_losses or {}).items()},
            "valid_losses": {k: float(v) for k, v in (valid_losses or {}).items()},
        }
        stats = getattr(trainer.model, "stats", None)
        if stats is not None:
            meta["stats"] = jax.tree.map(float, stats)
        wandb = getattr(getattr(trainer, "logger", None), "wandb", None)
        if wandb is not None:
            meta["wandb_id"] = wandb.id
        self._write(path, state, meta)
        self._point(os.path.join(self.directory, "latest"), tag)

        # wandb artifact upload (reference logging.py:311-318)
        if wandb is not None:
            try:
                import wandb as _wandb
                art = _wandb.Artifact(f"model-{os.path.basename(self.directory)}",
                                      type="model",
                                      metadata={"mini_epoch":
                                                trainer.mini_epoch_count})
                art.add_dir(path)
                wandb.log_artifact(art)
            except Exception:
                pass

        err = (valid_losses or {}).get("total_mean_error")
        if self.keep_best and err is not None and err < self.best_error:
            self.best_error = float(err)
            self._point(os.path.join(self.directory, "best"), tag,
                        error=self.best_error)
        self._cleanup()

    def _write(self, path: str, state, meta: Dict):
        if os.path.exists(path):
            shutil.rmtree(path)
        tree = _np_tree({"params": state.params,
                         "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state,
                         "step": state.step,
                         "rng": state.rng})
        if self._ckptr is not None:
            self._ckptr.save(os.path.join(path, "state"), tree)
            self._ckptr.wait_until_finished()
        else:                                        # numpy fallback
            os.makedirs(path, exist_ok=True)
            leaves, treedef = jax.tree.flatten(tree)
            np.savez(os.path.join(path, "state.npz"),
                     **{str(i): l for i, l in enumerate(leaves)})
            meta["_treedef"] = str(treedef)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def _point(self, link: str, tag: str, **extra):
        with open(link + ".json", "w") as f:
            json.dump({"checkpoint": tag, **extra}, f)

    def _cleanup(self):
        """Keep only checkpoints referenced by latest/best (reference
        logging.py:293-327)."""
        keep = set()
        for name in ("latest", "best"):
            p = os.path.join(self.directory, name + ".json")
            if os.path.exists(p):
                with open(p) as f:
                    keep.add(json.load(f)["checkpoint"])
        for entry in os.listdir(self.directory):
            full = os.path.join(self.directory, entry)
            if (entry.startswith("checkpoint-") and os.path.isdir(full)
                    and entry not in keep):
                shutil.rmtree(full)

    # ---- load ---------------------------------------------------------------
    def resolve(self, which: str = "latest") -> Optional[str]:
        p = os.path.join(self.directory, which + ".json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return os.path.join(self.directory, json.load(f)["checkpoint"])

    def load(self, which: str = "latest", template=None
             ) -> Tuple[Optional[Dict], Optional[Dict]]:
        """Returns (state_tree, meta) or (None, None)."""
        path = self.resolve(which) if which in ("latest", "best") else which
        if path is None or not os.path.exists(path):
            return None, None
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if self._ckptr is not None and os.path.exists(os.path.join(path, "state")):
            target = _np_tree(template) if template is not None else None
            tree = self._ckptr.restore(os.path.join(path, "state"), target)
        else:
            data = np.load(os.path.join(path, "state.npz"))
            leaves = [data[str(i)] for i in range(len(data.files))]
            assert template is not None, "numpy fallback needs a template"
            treedef = jax.tree.structure(_np_tree(template))
            tree = jax.tree.unflatten(treedef, leaves)
        return tree, meta


def restore_train_state(tree: Dict, state_cls, jnp=None):
    """Rebuild a TrainState from the restored tree."""
    import jax.numpy as jnp
    return state_cls(
        params=jax.tree.map(jnp.asarray, tree["params"]),
        batch_stats=jax.tree.map(jnp.asarray, tree["batch_stats"]),
        opt_state=jax.tree.map(jnp.asarray, tree["opt_state"]),
        step=jnp.asarray(tree["step"]),
        rng=jnp.asarray(tree["rng"]))
