"""Typed experiment configuration.

Dataclass mirror of the reference's pydantic ``Config`` with its 7 sections and
JSON round-trip (``src/utils/config.py:151-224``): logging, dataset, model,
settings, training, rollout, preproc. Unknown keys are rejected
(``extra="forbid"`` parity); ``to_flat_dict`` reproduces ``to_flat_json`` for
metric loggers; ``MACHINE_PATHS``-style per-machine data-root remapping is kept
(``config.py:14-18, 196-202``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

# Per-machine dataset-root remapping (reference config.py:14-18). Extend as
# machines are added; "default" is used when the machine key is absent.
MACHINE_PATHS: Dict[str, str] = {
    "default": "data",
    "tpu": "data",
}


@dataclass
class LoggingConfig:
    """Reference config.py:66-79."""
    project: str = ""
    group: str = ""
    name: str = ""
    notes: str = ""
    save_overwrite: bool = True
    save_frequency: Optional[int] = 20
    loss_frequency: Optional[int] = None
    valid_frequency: Optional[int] = 20
    use_wandb: bool = False
    use_tensorboard: bool = False
    is_debug: bool = False
    # TPU-native extra: grad/param monitoring (reference constructs
    # ModelMonitor unconditionally, train.py:148; here it is switchable
    # because the jitted step must emit grads as an extra output)
    use_monitor: bool = True


@dataclass
class DatasetConfig:
    """Reference config.py:81-90."""
    module: str = "synthetic"           # synthetic | openfoam | cylinderflow
    name: str = "DataSet_OF"
    dpath: str = "data"
    stats_recompute: bool = False
    stats_fpath: Optional[str] = None
    grad_weights_recompute: bool = False
    shuffle: bool = True
    # TPU-native extras
    num_buckets: int = 1               # size-bucketed padding groups
    sampler: str = "balanced_chunked"  # samplers.SAMPLERS key
    # out-of-core streaming: None = auto (lazy when the subset exceeds
    # cache_meshes sims), True/False = force. Lazy mode reads field windows
    # from HDF5 per batch and bounds geometry/static-graph/banded-table
    # memory with LRU caches of cache_meshes entries (reference
    # DataSet.py:127-172 streams with SWMR handles + a 25-mesh LRU).
    lazy: Optional[bool] = None
    cache_meshes: int = 100
    # accumulate normalization stats over every stats_stride-th sample.
    # The reference accumulates over the full dataset (DataSet.py:314-337);
    # a uniform timestep subsample converges to the same Welford moments and
    # cuts the one-time host-side pass proportionally.
    stats_stride: int = 1


@dataclass
class ModelSection:
    """Reference config.py:125-137."""
    module: str = "models"
    name: str = "FvgnA"
    hidden_width: int = 128
    mp_num: int = 15
    cell_grad_weights_order: Optional[int] = None
    face_grad_weights_order: Optional[int] = None
    timestep_stride: Optional[int] = 1
    fpath: Optional[str] = None
    bundle_size: Optional[int] = None
    # TPU-native extras
    aggregation: str = "segment"       # "segment"|"gather"|"banded"|"pallas"
    compute_dtype: str = "float32"     # "bfloat16" runs the MLP stack on MXU
    remat: bool = False                # jax.checkpoint each GN block
    # learned-scale denorm init (FluxD/FvgnJ heads): None = reference
    # constants (Flux.py:465-469), "stats" = per-channel target std, or a
    # {channel: float} mapping
    scale_init: Optional[Union[str, Dict[str, float]]] = None
    # stop-gradient the named channels ("pressure"/"velocity"/"flux") inside
    # physical integrators so supervised heads learn from their own losses
    integrator_detach: List[str] = field(default_factory=list)
    # override the model class's pushforward flag (None = class default;
    # e.g. FluxD + pushforward for rollout-stable flagship training)
    pushforward: Optional[bool] = None
    # with model.fpath set for TRAINING, the reference warm-starts weights
    # and resumes the checkpoint's epoch counters (train.py:333-385).
    # warm_start_reset=True keeps fresh counters/optimizer instead, for
    # fine-tuning under a new schedule (TPU-build extension).
    warm_start_reset: bool = False


@dataclass
class SettingsConfig:
    """Reference config.py:116-122 (device strings -> JAX platform names)."""
    machine: str = "tpu"
    device: str = "tpu"
    multi_gpu: bool = False            # kept name for config-file parity
    num_devices: Optional[int] = None
    pin_memory: bool = True            # no-op on TPU; kept for parity
    random_seed: int = 0
    debug_nans: bool = False           # jax_debug_nans (the TPU-native
    #                                    analogue of torch detect_anomaly)


@dataclass
class TrainingConfig:
    """Reference config.py:24-63."""
    data_subset: str = "train"
    data_sim_limit: Optional[int] = None
    data_timestep_range: Optional[List[int]] = None
    epochs: int = 1
    batch_size: int = 4
    mini_epoch_size: int = 1000
    optimizer_name: str = "AdamW"
    clip_grad_norm: Optional[float] = 10.0
    lr_max: float = 1e-3
    lr_min: Optional[float] = 1e-6
    lr_class: str = "CosineAnnealingTwoPhase"
    lr_wu: Optional[float] = 0.02
    lr_wu_gamma: Optional[float] = 0.04
    lr_ms1: Optional[float] = 0.3
    lr_ms1_gamma: Optional[float] = None
    lr_ms2: Optional[float] = 0.6
    lr_ms2_gamma: Optional[float] = 0.1
    lr_ms3: Optional[float] = 0.98
    noise_std: Optional[float] = None
    noise_std_norm: Optional[float] = 0.045
    pushforward_factor: Optional[int] = None
    # epochs of plain one-step training before the pushforward unroll kicks
    # in (an untrained model's unrolled states make the retargeted Delta-v
    # supervision chaotic; see TRAINING.md)
    pushforward_warmup_epochs: int = 0
    dropout_rate: float = 0.0
    loss_weights: Dict[str, float] = field(default_factory=lambda: {
        "continuity": 0.0, "cell_velocity_change": 10.0, "cell_velocity": 10.0,
        "cell_pressure": 1.0, "face_velocity": 1.0, "face_flux": 1.0,
        "face_pressure": 1.0})
    num_workers: int = 0
    persistent_workers: bool = False
    prefetch_factor: int = 2
    # TPU-native extras
    pad_multiple: int = 128
    prefetch_buffer: int = 2
    # fuse this many optimizer steps into ONE jitted lax.scan call when
    # consecutive batches share a mesh combination (balanced_chunked): on a
    # tunneled TPU per-call dispatch latency dominates the ~12 ms of step
    # compute. Best when it divides mini_epoch_size // batch_size.
    steps_per_call: int = 1
    # device-resident trajectory fields for the fused path: transfer each
    # mesh combination's full field store to HBM once and gather per-step
    # (N, W, D) windows on device from timestep indices. None = auto
    # (enabled when the padded dataset fits a conservative HBM budget).
    device_fields: Optional[bool] = None


@dataclass
class RolloutSection:
    """Reference config.py:92-113."""
    data_subset: str = "valid"
    data_sim_limit: Optional[int] = None
    data_sim_index: Optional[List[int]] = None
    data_timestep_range: Optional[List[int]] = None
    batch_size: int = 1
    num_workers: int = 0
    save_frequency: int = 1
    persistent_workers: bool = False
    prefetch_factor: int = 2
    snapshot_indices: List[int] = field(default_factory=list)


@dataclass
class PreprocConfig:
    """Reference config.py:139-148."""
    data_subset: str = "train"
    data_sim_limit: Optional[int] = None
    data_timestep_range: Optional[List[int]] = None
    vtk_dpath: Optional[str] = None
    out_dpath: Optional[str] = None
    num_workers: int = 0


@dataclass
class Config:
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelSection = field(default_factory=ModelSection)
    settings: SettingsConfig = field(default_factory=SettingsConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    rollout: RolloutSection = field(default_factory=RolloutSection)
    preproc: PreprocConfig = field(default_factory=PreprocConfig)

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Config":
        """Strict construction: unknown sections/keys raise (pydantic
        ``extra='forbid'`` parity, reference config.py:151-164)."""
        sections = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for key, value in data.items():
            if key not in sections:
                raise ValueError(f"unknown config section {key!r}")
            sec_cls = sections[key].default_factory
            sec_fields = {f.name for f in dataclasses.fields(sec_cls)}
            unknown = set(value) - sec_fields
            if unknown:
                raise ValueError(f"unknown keys in [{key}]: {sorted(unknown)}")
            kwargs[key] = sec_cls(**value)
        cfg = cls(**kwargs)
        cfg.apply_machine_paths()
        return cfg

    def apply_machine_paths(self):
        """Prefix the dataset path with the machine's data root
        (reference config.py:196-202)."""
        root = MACHINE_PATHS.get(self.settings.machine)
        if root and not self.dataset.dpath.startswith(("/", root)):
            self.dataset.dpath = f"{root}/{self.dataset.dpath}"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_flat_dict(self) -> Dict[str, Any]:
        """section.key flattening for metric loggers
        (reference ``to_flat_json``, config.py:205-224)."""
        flat = {}
        for sec, val in self.to_dict().items():
            for k, v in val.items():
                flat[f"{sec}.{k}"] = v
        return flat

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(json.load(f))


def merge_checkpoint_config(current: Config, checkpoint_cfg: Dict[str, Any]
                            ) -> Config:
    """Resume-time merge: current values override checkpoint values, but the
    checkpoint supplies anything the current config leaves at default
    (reference ``merge_checkpoint_config``, model_loading.py:21-87 — the
    current-over-checkpoint direction). Machine paths re-applied after."""
    merged = checkpoint_cfg.copy()
    cur = current.to_dict()
    default = Config().to_dict()
    for sec, vals in cur.items():
        merged.setdefault(sec, {})
        for k, v in vals.items():
            if sec not in checkpoint_cfg or k not in checkpoint_cfg.get(sec, {}):
                merged[sec][k] = v
            elif v != default[sec][k]:
                merged[sec][k] = v
    cfg = Config.from_dict(merged)
    return cfg
