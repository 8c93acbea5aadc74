from gnn_fluid_dynamics_tpu.training.config import Config, load_config  # noqa: F401
