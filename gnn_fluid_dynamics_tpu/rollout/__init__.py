from gnn_fluid_dynamics_tpu.rollout.engine import RolloutConfig, rollout_scan  # noqa: F401
