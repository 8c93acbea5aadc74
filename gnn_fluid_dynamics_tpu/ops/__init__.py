from gnn_fluid_dynamics_tpu.ops import connectivity, fvm, geometry, mls, segment  # noqa: F401
