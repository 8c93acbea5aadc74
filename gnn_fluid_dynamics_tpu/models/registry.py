"""Model registry: name -> FluidModel class.

Replaces the reference's dynamic ``import_module``/``getattr`` model selection
(``src/train.py:347-349``) with an explicit registry so jit sees concrete
classes and typos fail loudly.
"""

from __future__ import annotations

from gnn_fluid_dynamics_tpu.models.conservative import (
    ConservativeA, ConservativeB, ConservativeD, ConservativeE, ConservativeF,
    ConservativeG, ConservativeH, ConservativeI, ConservativeJ, ConservativeK)
from gnn_fluid_dynamics_tpu.models.flux import FluxA, FluxB, FluxC, FluxD
from gnn_fluid_dynamics_tpu.models.fvgn import (FvgnA, FvgnB, FvgnC, FvgnD,
                                                FvgnE, FvgnF, FvgnH, FvgnI,
                                                FvgnJ, FvgnK)
from gnn_fluid_dynamics_tpu.models.mgn import MgnA, MgnB, MgnC
from gnn_fluid_dynamics_tpu.models.streamfunc import (StreamFuncA, StreamFuncB,
                                                      StreamFuncC, StreamFuncD)
from gnn_fluid_dynamics_tpu.models.vertpot import (VertPotA, VertPotB,
                                                   VertPotC, VertPotD,
                                                   VertPotE, VertPotF,
                                                   VertPotG)

MODEL_REGISTRY = {
    cls.name: cls
    for cls in (FvgnA, FvgnB, FvgnC, FvgnD, FvgnE, FvgnF, FvgnH, FvgnI,
                FvgnJ, FvgnK,
                MgnA, MgnB, MgnC,
                FluxA, FluxB, FluxC, FluxD,
                ConservativeA, ConservativeB, ConservativeD, ConservativeE,
                ConservativeF, ConservativeG, ConservativeH, ConservativeI,
                ConservativeJ, ConservativeK,
                VertPotA, VertPotB, VertPotC, VertPotD, VertPotE, VertPotF,
                VertPotG,
                StreamFuncA, StreamFuncB, StreamFuncC, StreamFuncD)
}


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}") from None
