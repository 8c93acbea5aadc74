"""FluidModel protocol: the functional counterpart of the reference's abstract
``Model`` (``src/models/Model.py:46-161``).

Each model family is a plain-Python class owning (a) a frozen arch config,
(b) a Flax module, (c) a declarative normalization map, and (d) pure functions
for feature transformation, loss, and rollout feedback. Parameters and batch
stats are external pytrees (Flax variables); dataset statistics are a pytree
captured at construction — nothing is mutated, so every method can sit under
``jit``/``scan``/``shard_map``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models import normalizer as norm
from gnn_fluid_dynamics_tpu.models.arch import ArchConfig


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model section of the experiment config (reference ``config.py:125-137``)."""
    name: str = "FvgnA"
    hidden_width: int = 128
    mp_num: int = 15
    cell_grad_weights_order: Optional[int] = None
    face_grad_weights_order: Optional[int] = None
    timestep_stride: Optional[int] = 1
    bundle_size: Optional[int] = None
    fpath: Optional[str] = None
    # TPU-native extras
    aggregation: str = "segment"      # "segment" | "gather"
    remat: bool = False               # rematerialize GN blocks in backward
    dropout_rate: float = 0.0
    num_face_types: int = 5
    compute_dtype: str = "float32"    # "bfloat16" for MXU-rate MLPs
    # learned-scale denorm initialization for FvgnJ/FluxD-style heads:
    # None = the reference's shipped constants (Flux.py:465-469);
    # "stats" = per-channel target std from the dataset statistics (better
    # conditioned when the data's magnitudes differ from the reference's);
    # or a mapping {velocity_x, velocity_y, pressure, flux, diffusion} ->
    # float (given as a tuple of pairs so the frozen config stays hashable)
    scale_init: Optional[object] = None
    # channels whose gradient is STOPPED inside the physical integrator
    # ("pressure", "velocity", "flux"): the directly-supervised heads then
    # learn only from their own losses while the (unsupervised) diffusion
    # head carries the Delta-v closure. Fixes the collapse where the
    # dt/V-amplified cell_velocity_change loss drives the supervised heads
    # toward zero early in training. () = reference behavior.
    integrator_detach: Tuple[str, ...] = ()
    # override the class-level pushforward flag (reference ties pushforward
    # to FvgnD only, Fvgn.py:789-836; the TPU build lets any family opt in —
    # e.g. FluxD + pushforward for rollout-stable flagship training).
    # None = use the class default.
    pushforward: Optional[bool] = None


class FluidModel:
    """Base class; subclasses implement the family-specific hooks."""

    name = "base"
    cell_grad_weights_use = False     # reference Model.py:53
    face_grad_weights_use = False
    pushforward_use = False
    needs_face_flux = False           # dataset must provide face flux fields

    def __init__(self, config: ModelConfig, stats: Optional[Dict] = None,
                 loss_weights: Optional[Dict[str, float]] = None):
        self.config = config
        if config.pushforward is not None:
            # shadow the class attribute on the instance
            self.pushforward_use = bool(config.pushforward)
        self.arch = ArchConfig(
            hidden=config.hidden_width, mp_num=config.mp_num,
            dropout_rate=config.dropout_rate, aggregation=config.aggregation,
            remat=config.remat,
            block_order=self.block_order(), share_blocks=self.share_blocks(),
            step_scalar=self.step_scalar(), compute_dtype=config.compute_dtype)
        self.nmap = self.normalisation_map()
        self.loss_weights = loss_weights or {}
        self.stats = None
        if stats is not None:
            self.set_stats(stats)
        self.module = self.build_module()

    # ---- architecture hooks -------------------------------------------------
    def block_order(self) -> str:
        return "cell_first"

    def share_blocks(self) -> bool:
        return False

    def step_scalar(self) -> bool:
        return False

    def build_module(self):
        raise NotImplementedError

    # ---- normalization ------------------------------------------------------
    def normalisation_map(self) -> norm.NormalizationMap:
        raise NotImplementedError

    def set_stats(self, stats: Dict):
        self.stats = norm.stats_to_arrays(stats)
        # some modules (e.g. FvgnB) close over stats for in-module denorm
        self.module = self.build_module()
        self._init_jit = None
        self._transform_rollout_jit = None

    # ---- data interface -----------------------------------------------------
    def transform_features(self, graph: MeshGraph, rng: Optional[jax.Array],
                           mode: str = "train", noise_std: float = 0.0
                           ) -> Tuple[MeshGraph, Dict[str, jax.Array]]:
        raise NotImplementedError

    # ---- forward ------------------------------------------------------------
    def module_inputs(self, nfeats: Dict) -> tuple:
        """Which bundle tensors feed the Flax module (overridden by families
        with split symmetric/antisymmetric edge features)."""
        return (nfeats["cell_x"], nfeats["face_x"])

    def init(self, rng: jax.Array, graph: MeshGraph, feats: Dict) -> Dict:
        # jitted: eager per-op dispatch is very slow over a remote TPU tunnel
        if getattr(self, "_init_jit", None) is None:
            def _init(rng, graph, feats):
                nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
                return self.module.init({"params": rng},
                                        *self.module_inputs(nfeats),
                                        graph, False)
            self._init_jit = jax.jit(_init)
        return self._init_jit(rng, graph, feats)

    def transform_rollout(self, graph: MeshGraph):
        """Jitted rollout-mode feature transform for eager call sites
        (validation setup, CLIs, stats accumulation)."""
        if getattr(self, "_transform_rollout_jit", None) is None:
            self._transform_rollout_jit = jax.jit(
                lambda g: self.transform_features(g, None, "rollout"))
        return self._transform_rollout_jit(graph)

    def forward(self, variables: Dict, graph: MeshGraph, feats: Dict,
                mode: str = "train", rngs: Optional[Dict] = None
                ) -> Tuple[Dict[str, jax.Array], Dict]:
        """Returns (outputs dict, updated batch-stats collection or {}).

        Matches reference forward semantics: inputs (and targets) normalized;
        outputs denormalized only in rollout mode (e.g. ``Fvgn.py:150-174``).
        The loss therefore runs in normalized space with normalized targets —
        callers must pass the *normalized* feats (returned under key
        ``"_nfeats"`` in outputs) to :meth:`loss`.
        """
        raise NotImplementedError

    def _apply(self, variables, nfeats, graph, train, rngs):
        inputs = self.module_inputs(nfeats)
        if train:
            result, updates = self.module.apply(
                variables, *inputs, graph, True,
                rngs=rngs, mutable=["batch_stats"])
            # normalize to plain nested dicts: a FrozenDict/dict mismatch
            # between init and apply changes the pytree treedef and forces a
            # jit retrace every step
            import flax
            return result, flax.core.unfreeze(updates)
        result = self.module.apply(variables, *inputs, graph, False,
                                   rngs=rngs, mutable=False)
        return result, {}

    # ---- loss ---------------------------------------------------------------
    def loss(self, outputs: Dict, feats: Dict, graph: MeshGraph
             ) -> Dict[str, jax.Array]:
        raise NotImplementedError

    # ---- rollout ------------------------------------------------------------
    def derive_state(self, outputs: Dict, feats: Dict, graph: MeshGraph
                     ) -> Dict[str, jax.Array]:
        """Physical state for error metrics / saving: always produces
        ``cell_velocity`` (+= change if needed) and ``cell_pressure``
        (face->centroid if needed) — reference ``rollout.py:337-346``."""
        sol = dict(outputs)
        sol.pop("_nfeats", None)
        if "cell_velocity" not in sol and "cell_velocity_change" in sol:
            sol["cell_velocity"] = feats["cell_x"][:, 0:2] + sol["cell_velocity_change"]
        if "cell_pressure" not in sol and "face_pressure" in sol:
            from gnn_fluid_dynamics_tpu.models.arch import gather3
            fp = sol["face_pressure"].reshape(-1, 1)
            sol["cell_pressure"] = jnp.mean(gather3(fp, graph), axis=1)
        return sol

    def update_features(self, solutions: Dict, feats: Dict, graph: MeshGraph
                        ) -> Dict[str, jax.Array]:
        """Autoregressive feedback (reference ``update_features``,
        ``Fvgn.py:133-148``): new cell velocity in, face Δv recomputed with
        INFLOW/WALL faces clamped to the (initial) BC targets."""
        from gnn_fluid_dynamics_tpu.models.transforms import (
            calc_face_velocity_change, rollout_bc_mask)
        new_feats = dict(feats)
        v = solutions["cell_velocity"]
        new_feats["cell_x"] = v
        if graph.cf_row_onehot is not None:
            from gnn_fluid_dynamics_tpu.models.arch import gather_face_cells
            row, col = gather_face_cells(v[:, :2], graph, "banded")
            dv = row - col
        else:
            dv = calc_face_velocity_change(v[:, :2], graph.cell_edge_index)
        mask = rollout_bc_mask(graph.face_type)
        dv = jnp.where(mask[:, None], feats["face_y"][:, 0:2], dv)
        new_feats["face_x"] = feats["face_x"].at[:, 0:2].set(dv)
        return new_feats

    # ---- introspection ------------------------------------------------------
    def count_parameters(self, variables) -> int:
        return sum(x.size for x in jax.tree.leaves(variables.get("params", {})))


def masked(mask_a, mask_b=None):
    return mask_a if mask_b is None else (mask_a & mask_b)


def feature_masks(graph: MeshGraph, feats: Dict) -> Dict:
    """Validity masks per bundle tensor, for stats accumulation."""
    out = {}
    for key in feats:
        if key.startswith("cell"):
            out[key] = graph.cell_mask
        elif key.startswith("face"):
            out[key] = graph.face_mask
    return out
