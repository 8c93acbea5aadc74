from gnn_fluid_dynamics_tpu.parallel.data_parallel import (  # noqa: F401
    make_device_mesh, make_dp_indexed_train_step, make_dp_train_step,
    replicate, shard_batch, shard_device_fields)
from gnn_fluid_dynamics_tpu.parallel.spmd import (  # noqa: F401
    make_mesh_2d, make_mesh_spatial, make_spmd_rollout, make_spmd_train_step,
    replicate_2d, shard_graph_spatial, shard_spatial_batch)
