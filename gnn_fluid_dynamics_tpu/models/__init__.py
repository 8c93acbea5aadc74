from gnn_fluid_dynamics_tpu.models.registry import get_model_class, MODEL_REGISTRY  # noqa: F401
