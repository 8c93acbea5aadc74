"""Precompute and cache dataset stats for a train config on the host CPU.

The training CLI computes stats lazily at startup (train.py:compute_stats)
which burns TPU-queue wall time when several configs share the slot.  This
script runs the identical accumulation path standalone so the cached
``stats_fpath`` file is ready before the queue reaches the config.

    JAX_PLATFORMS=cpu python scripts/precompute_stats.py config/e2e/vertpota-r5.json
"""
import sys

sys.path.insert(0, ".")


def main(config_path: str) -> None:
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.training.config import load_config
    from gnn_fluid_dynamics_tpu.training.train import (build_datasets,
                                                       compute_stats)

    config = load_config(config_path)
    model_cls = get_model_class(config.model.name)
    model = model_cls(
        ModelConfig(name=config.model.name,
                    hidden_width=config.model.hidden_width,
                    mp_num=config.model.mp_num,
                    cell_grad_weights_order=config.model.cell_grad_weights_order,
                    face_grad_weights_order=config.model.face_grad_weights_order,
                    timestep_stride=config.model.timestep_stride,
                    bundle_size=config.model.bundle_size,
                    aggregation=config.model.aggregation,
                    compute_dtype=config.model.compute_dtype,
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward),
        loss_weights=config.training.loss_weights)
    train_ds, _ = build_datasets(config, model_cls, splits=("train",))
    stats = compute_stats(config, model, train_ds)
    print(f"stats ready for {config.model.name}: "
          f"{sorted(stats)} -> {config.dataset.stats_fpath}")


if __name__ == "__main__":
    main(sys.argv[1])
