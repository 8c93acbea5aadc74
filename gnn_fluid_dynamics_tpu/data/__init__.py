from gnn_fluid_dynamics_tpu.data import synthetic  # noqa: F401
