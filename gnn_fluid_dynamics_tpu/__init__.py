"""gnn_fluid_dynamics_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for learned
fluid simulation on unstructured triangular meshes.

Built from scratch with the capabilities of the reference repo
``aj-dray/gnn-fluid-dynamics`` (a PyTorch/PyG MeshGraphNets + FVGN research stack),
re-designed TPU-first:

* the three PyG ``Data`` objects (cell/face/vertex graphs; reference
  ``src/datasets/DataSet.py:210-274``) become a single typed, padded
  :class:`~gnn_fluid_dynamics_tpu.graph.MeshGraph` pytree with static shapes;
* all ``scatter_add``/``index_select`` message passing (reference
  ``src/models/Fvgn.py:298-325``) becomes masked ``segment_sum`` / precomputed
  incidence gathers that XLA fuses onto the VPU, with a Pallas kernel for the hot
  edge→vertex→cell aggregation;
* owner/neighbour flux sign bookkeeping (reference ``src/utils/fvm.py:96-156``)
  is precomputed into static per-mesh sign tables so flux conversion is a gather;
* the autoregressive rollout (reference ``src/rollout.py:255-385``) is one
  on-device ``lax.scan``;
* data parallelism (reference's broken DDP, ``src/train.py:398-415``) is a
  working ``shard_map`` over an ICI device mesh with ``psum`` gradient reduction.
"""

__version__ = "0.1.0"

from gnn_fluid_dynamics_tpu.graph import MeshGraph  # noqa: F401
