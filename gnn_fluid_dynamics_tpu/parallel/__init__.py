from gnn_fluid_dynamics_tpu.parallel.data_parallel import (  # noqa: F401
    make_device_mesh, make_dp_train_step, shard_batch, replicate)
