"""Model registry: name -> FluidModel class.

Replaces the reference's dynamic ``import_module``/``getattr`` model selection
(``src/train.py:347-349``) with an explicit registry so jit sees concrete
classes and typos fail loudly.
"""

from __future__ import annotations

from gnn_fluid_dynamics_tpu.models.flux import FluxA, FluxB, FluxD
from gnn_fluid_dynamics_tpu.models.fvgn import (FvgnA, FvgnB, FvgnD, FvgnF,
                                                FvgnI, FvgnJ)
from gnn_fluid_dynamics_tpu.models.mgn import MgnA, MgnB, MgnC

MODEL_REGISTRY = {
    cls.name: cls
    for cls in (FvgnA, FvgnB, FvgnD, FvgnF, FvgnI, FvgnJ,
                MgnA, MgnB, MgnC,
                FluxA, FluxB, FluxD)
}


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}") from None
