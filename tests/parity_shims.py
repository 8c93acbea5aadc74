"""Shims to execute the PyTorch reference (`/root/reference/src`) WITHOUT
torch_geometric / torch_scatter / pyvista, for direct numerical parity tests
(BASELINE.md north star: "identical one-step losses").

The reference's actual usage of the missing deps is tiny (VERDICT r2 #1):

* ``torch_scatter.scatter_add``  -> ``Tensor.index_add_`` (used in
  ``Fvgn.py:314`` Cell_Block and the VertPot vertex block)
* PyG ``Data``                   -> attribute bag with ``clone()``
  (``Fvgn.py:266, 284, 296, 325``)
* PyG ``global_add_pool`` / ``global_mean_pool`` -> segment sums over the
  batch vector (``loss.py:36-89``)
* ``pyvista`` / PyG ``Dataset``/``DataLoader``   -> import-time stubs only
  (the parity tests never touch preprocessing or loading)

Nothing here copies reference logic — these are minimal reimplementations of
*third-party library* APIs so the reference's own code can run.
"""

from __future__ import annotations

import copy
import sys
import types

import numpy as np
import torch

REFERENCE_SRC = "/root/reference/src"


class Data:
    """Minimal PyG ``torch_geometric.data.Data``: an attribute container.

    ``num_nodes`` mirrors PyG's behavior: an explicitly set value wins,
    otherwise it is inferred from ``x`` / ``pos`` — intermediate graphs the
    reference blocks build inline (e.g. Fvgn.py:314) rely on the inference."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def num_nodes(self):
        if "_num_nodes" in self.__dict__:
            return self._num_nodes
        for attr in ("x", "pos"):
            v = self.__dict__.get(attr)
            if v is not None:
                return int(v.shape[0])
        raise AttributeError("num_nodes not set and not inferrable")

    @num_nodes.setter
    def num_nodes(self, value):
        self._num_nodes = int(value)

    def clone(self):
        new = Data()
        for k, v in self.__dict__.items():
            if torch.is_tensor(v):
                new.__dict__[k] = v.clone()
            else:
                new.__dict__[k] = copy.deepcopy(v)
        return new


def scatter_add(src, index, dim=0, dim_size=None):
    """torch_scatter.scatter_add via index_add_."""
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    return out.index_add_(dim, index, src)


def global_add_pool(x, batch):
    n = int(batch.max()) + 1
    shape = (n,) + tuple(x.shape[1:])
    out = torch.zeros(shape, dtype=x.dtype, device=x.device)
    return out.index_add_(0, batch, x)


def global_mean_pool(x, batch):
    s = global_add_pool(x, batch)
    ones = torch.ones(x.shape[0], dtype=x.dtype, device=x.device)
    cnt = torch.zeros(s.shape[0], dtype=x.dtype,
                      device=x.device).index_add_(0, batch, ones)
    cnt = cnt.reshape((-1,) + (1,) * (s.dim() - 1))
    return s / cnt


def install_shims():
    """Install fake torch_scatter / torch_geometric / pyvista modules and put
    the reference src tree on sys.path. Idempotent."""
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_add = scatter_add
        sys.modules["torch_scatter"] = ts

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")
        tgd.Data = Data
        tgd.Dataset = type("Dataset", (), {})
        tgl = types.ModuleType("torch_geometric.loader")
        tgl.DataLoader = type("DataLoader", (), {})
        tgn = types.ModuleType("torch_geometric.nn")
        tgn.global_add_pool = global_add_pool
        tgn.global_mean_pool = global_mean_pool
        tgu = types.ModuleType("torch_geometric.utils")
        tgu.unbatch = None
        tg.data, tg.loader, tg.nn, tg.utils = tgd, tgl, tgn, tgu
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tgd
        sys.modules["torch_geometric.loader"] = tgl
        sys.modules["torch_geometric.nn"] = tgn
        sys.modules["torch_geometric.utils"] = tgu

    if "pyvista" not in sys.modules:
        sys.modules["pyvista"] = types.ModuleType("pyvista")

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


# ---------------------------------------------------------------------------
# Reference-side config / dataset stand-ins
# ---------------------------------------------------------------------------

def make_ref_config(hidden_width: int, mp_num: int, loss_weights: dict,
                    **model_extra):
    """SimpleNamespace mirror of the reference pydantic Config, with just the
    attributes the model classes read."""
    model = types.SimpleNamespace(hidden_width=hidden_width, mp_num=mp_num,
                                  cell_grad_weights_order=None,
                                  face_grad_weights_order=None)
    for k, v in model_extra.items():
        setattr(model, k, v)
    training = types.SimpleNamespace(dropout_rate=0.0,
                                     loss_weights=dict(loss_weights),
                                     noise_std=0.0)
    return types.SimpleNamespace(model=model, training=training)


def make_ref_dataset(node_type_enum, config, mode="rollout"):
    return types.SimpleNamespace(noise=False, mode=mode,
                                 class_types=node_type_enum, config=config)


# ---------------------------------------------------------------------------
# Graph conversion: my MeshGraph (unpadded, single mesh) -> reference graphs
# ---------------------------------------------------------------------------

def _t(x, dtype=None):
    arr = np.asarray(x)
    t = torch.from_numpy(np.ascontiguousarray(arr))
    if dtype is not None:
        t = t.to(dtype)
    elif t.dtype == torch.float64:
        t = t.float()
    elif t.dtype == torch.int32:
        t = t.long()
    return t


def to_reference_graphs(graph):
    """Build the reference's [cell_graph, face_graph, vertex_graph] from an
    UNPADDED single-mesh MeshGraph (reference ``DataSet._process_timestep``,
    DataSet.py:210-274)."""
    C = int(graph.num_cells)
    F = int(graph.num_faces)
    assert graph.cell_pos.shape[0] == C and graph.face_area.shape[0] == F, \
        "parity graphs must be unpadded (pad_multiple=1)"
    c_graph = Data(
        pos=_t(graph.cell_pos),
        velocity=_t(graph.cell_velocity),
        pressure=_t(graph.cell_pressure),
        edge_index=_t(graph.cell_edge_index, torch.long),
        normal=_t(graph.cell_normal),
        volume=_t(graph.cell_volume).reshape(-1, 1),
        dt=_t(np.broadcast_to(np.asarray(graph.dt), (1,)).copy()),
        batch=torch.zeros(C, dtype=torch.long),
        num_nodes=C,
    )
    f_graph = Data(
        velocity=_t(graph.face_velocity),
        pressure=_t(graph.face_pressure),
        flux=(_t(graph.face_flux) if graph.face_flux is not None else None),
        area=_t(graph.face_area).reshape(-1, 1),
        # 1-D like the reference's real data: vertex_type is np.full(n_points,)
        # (OpenFoam.py:122) so classify_edges yields (F,) — update_features'
        # boolean row-mask (Fvgn.py:140-144) depends on this shape
        type=_t(graph.face_type, torch.long).reshape(-1),
        face=_t(graph.face_index, torch.long),
        normal=_t(graph.face_normal),
        pos=_t(graph.face_pos) if graph.face_pos is not None else None,
        batch=torch.zeros(F, dtype=torch.long),
        num_nodes=F,
    )
    if graph.cell_grad_weights is not None:
        c_graph.grad_weights = _t(graph.cell_grad_weights)
        c_graph.grad_neighbours = _t(graph.cell_grad_neighbours, torch.long)
    if graph.reynolds is not None:
        c_graph.Re = _t(np.broadcast_to(np.asarray(graph.reynolds,
                                                   np.float32), (1,)).copy())
    if graph.face_grad_weights is not None:
        f_graph.grad_weights = _t(graph.face_grad_weights)
        f_graph.grad_neighbours = _t(graph.face_grad_neighbours, torch.long)
    v_graph = Data(
        pos=_t(graph.vertex_pos),
        edge_index=_t(graph.vertex_edge_index, torch.long),
        face=_t(graph.vertex_face, torch.long),
        batch=torch.zeros(int(graph.num_vertices), dtype=torch.long),
        num_nodes=int(graph.num_vertices),
    )
    return [c_graph, f_graph, v_graph]


def stats_to_python(stats) -> dict:
    """My StatsAccumulator stats -> plain float dicts for the reference
    CustomNormalizer buffers."""
    out = {}
    for key, d in stats.items():
        out[key] = {s: float(v) for s, v in d.items()}
    return out


# ---------------------------------------------------------------------------
# Weight transplant: flax params -> torch state dict
# ---------------------------------------------------------------------------

def _copy_mlp(jp: dict, torch_mlp, layer_norm: bool):
    """Copy one flax MLP (Dense_0/1/2 [+ LayerNorm_0]) into the reference
    ``build_mlp`` Sequential."""
    seq = torch_mlp[0] if layer_norm else torch_mlp
    with torch.no_grad():
        for i, dense in enumerate(["Dense_0", "Dense_1", "Dense_2"]):
            lin = seq[2 * i]
            lin.weight.copy_(_t(np.asarray(jp[dense]["kernel"]).T))
            lin.bias.copy_(_t(np.asarray(jp[dense]["bias"])))
        if layer_norm:
            ln = torch_mlp[1]
            ln.weight.copy_(_t(np.asarray(jp["LayerNorm_0"]["scale"])))
            ln.bias.copy_(_t(np.asarray(jp["LayerNorm_0"]["bias"])))


def copy_epd_weights(params_epd: dict, ref_model, mp_num: int,
                     decoder_attr="face_mlp", jax_decoder_key="decoder_face"):
    """Transplant my EncodeProcessDecode params into the reference
    encoder/processer_list/decoder (FvgnA-family layout, Fvgn.py:257-333;
    the MGN decoder head lives on cells but is also attr-named ``face_mlp``,
    Mgn.py:270-275 — pass ``jax_decoder_key='decoder_cell'`` for it)."""
    enc = params_epd["Encoder_0"]
    _copy_mlp(enc["face_mlp"], ref_model.encoder.face_mlp, True)
    _copy_mlp(enc["cell_mlp"], ref_model.encoder.cell_mlp, True)
    for i in range(mp_num):
        blk = params_epd[f"GNBlock_{i}"]
        ref_blk = ref_model.processer_list[i]
        _copy_mlp(blk["CellBlock_0"]["MLP_0"], ref_blk.cell_block.cell_mlp,
                  True)
        _copy_mlp(blk["FaceBlock_0"]["MLP_0"], ref_blk.face_block.face_mlp,
                  True)
    _copy_mlp(params_epd[jax_decoder_key],
              getattr(ref_model.decoder, decoder_attr), False)


def _copy_antisym_mlp(jp: dict, torch_mlp):
    """Copy my AntisymMLP (3 bias-free Dense, tanh) into the reference
    ``build_mlp_antisym`` Sequential (Conservative.py:31-43: Linear(bias=False)
    / Tanh / Linear / Tanh / Linear, no norm layer)."""
    with torch.no_grad():
        for i, dense in enumerate(["Dense_0", "Dense_1", "Dense_2"]):
            torch_mlp[2 * i].weight.copy_(
                _t(np.asarray(jp[dense]["kernel"]).T))


def copy_conservative_weights(params: dict, ref_model, mp_num: int):
    """Transplant my _ConsAModule params into the reference ConservativeA
    (Conservative.py:49-262: dual symm/asym encoder, face/cell blocks with
    the asym gate, no-norm face decoder; FvgnA integrator)."""
    enc = params["_ConsEncoder_0"]
    _copy_mlp(enc["faceS_mlp"], ref_model.encoder.faceS_mlp, True)
    _copy_antisym_mlp(enc["faceA_mlp"], ref_model.encoder.faceA_mlp)
    _copy_mlp(enc["cell_mlp"], ref_model.encoder.cell_mlp, True)
    for i in range(mp_num):
        blk = params[f"_ConsABlock_{i}"]
        ref_blk = ref_model.processer_list[i]
        _copy_mlp(blk["face_mlp"], ref_blk.face_block.face_mlp, True)
        _copy_mlp(blk["cell_mlp"], ref_blk.cell_block.cell_mlp, True)
    _copy_mlp(params["decoder_face"], ref_model.decoder.face_mlp, False)


def copy_vertpot_weights(params: dict, ref_model, mp_num: int):
    """Transplant my _VertPotModule params into the reference VertPotA
    (VertPot.py:47-231). The reference GN_Block builds UNUSED face_block /
    cell_block via ``super().__init__`` and runs node_block / edge_block /
    vertex_block instead (VertPot.py:187-210) — copy into the used pair."""
    enc = params["Encoder_0"]
    _copy_mlp(enc["face_mlp"], ref_model.encoder.face_mlp, True)
    _copy_mlp(enc["cell_mlp"], ref_model.encoder.cell_mlp, True)
    for i in range(mp_num):
        ref_blk = ref_model.processer_list[i]
        _copy_mlp(params[f"CellBlock_{i}"]["MLP_0"],
                  ref_blk.node_block.cell_mlp, True)
        _copy_mlp(params[f"FaceBlock_{i}"]["MLP_0"],
                  ref_blk.edge_block.face_mlp, True)
    _copy_mlp(params["decoder_face"], ref_model.decoder.edge_mlp, False)
    _copy_mlp(params["decoder_vertex"], ref_model.decoder.vertex_mlp, False)


def copy_scalar_params(params: dict, ref_model, names):
    """Copy my LearnedScaleDenorm scale params (shape (1,)) onto the
    reference's scalar ``nn.Parameter`` scales (Flux.py:465-469)."""
    with torch.no_grad():
        for name in names:
            scale = np.asarray(params[name]["scale"]).reshape(-1)
            # my diffusion_scale is per-channel (2,) where the reference
            # shares one scalar over both channels (Flux.py:468); at init
            # they are equal, which the transplant requires
            assert np.all(scale == scale[0]), name
            getattr(ref_model, name).copy_(torch.tensor(float(scale[0])))


def copy_batchnorm(jbn_params, torch_bn):
    """flax BatchNorm scale/bias -> torch BatchNorm1d (train mode uses batch
    statistics, so running stats need not be copied)."""
    with torch.no_grad():
        torch_bn.weight.copy_(_t(np.asarray(jbn_params["scale"]).reshape(-1)))
        torch_bn.bias.copy_(_t(np.asarray(jbn_params["bias"]).reshape(-1)))
