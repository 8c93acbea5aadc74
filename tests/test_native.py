"""Native C++ graph-builder equivalence tests: the ctypes path must produce
byte-identical connectivity to the numpy reference implementation."""

import numpy as np
import pytest

from gnn_fluid_dynamics_tpu import native
from gnn_fluid_dynamics_tpu.data.synthetic import (cylinder_channel_mesh,
                                                   structured_channel_mesh)
from gnn_fluid_dynamics_tpu.ops.connectivity import (
    compute_cell_face_sign, compute_connectivity, compute_owner_local_slot)
from gnn_fluid_dynamics_tpu.ops.segment import build_vertex_incidence

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("mesh", ["structured", "cylinder"])
def test_native_connectivity_matches_python(mesh):
    if mesh == "structured":
        pos, cells, _ = structured_channel_mesh(nx=7, ny=5, jitter=0.2, seed=1)
    else:
        pos, cells, _ = cylinder_channel_mesh(n_points=400, seed=3)
    fi_py, cei_py, vei_py = compute_connectivity(cells, pos)
    sign_py = compute_cell_face_sign(fi_py, cei_py)
    slot_py = compute_owner_local_slot(fi_py, cei_py)

    fi, cei, vei, sign, slot = native.compute_connectivity(cells, pos)
    np.testing.assert_array_equal(fi, fi_py)
    np.testing.assert_array_equal(vei, vei_py)
    np.testing.assert_array_equal(cei, cei_py)
    np.testing.assert_array_equal(sign, sign_py)
    np.testing.assert_array_equal(slot, slot_py)


def test_native_incidence_matches_python():
    pos, cells, _ = structured_channel_mesh(nx=6, ny=4)
    _, _, vei = compute_connectivity(cells, pos)
    V = pos.shape[0]
    inc_py = build_vertex_incidence(vei, V)
    edge_id, half, valid = native.build_vertex_incidence(vei, V)
    np.testing.assert_array_equal(edge_id, inc_py.edge_id)
    np.testing.assert_array_equal(half, inc_py.half)
    np.testing.assert_array_equal(valid, inc_py.valid)


def test_native_speedup_on_larger_mesh():
    import time
    pos, cells, _ = structured_channel_mesh(nx=60, ny=40)
    t0 = time.time()
    fi, cei, vei, sign, slot = native.compute_connectivity(cells, pos)
    t_native = time.time() - t0
    assert fi.shape[1] == cells.shape[0]
    # sanity: signs balance on interior faces
    interior = cei[0] != cei[1]
    assert float(sign.sum()) == float((~interior).sum())
    assert t_native < 1.0


def test_native_banded_fill_matches_numpy():
    """Native banded one-hot fill must match the np.add.at fallback."""
    import numpy as np
    from gnn_fluid_dynamics_tpu import native
    if not native.native_available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    Tn, tile, B, S = 3, 128, 256, 512
    nnz = 1000
    tgt = rng.randint(0, Tn * tile, nnz).astype(np.int64)
    offsets = (rng.randint(0, (S - B) // 8 + 1, Tn) * 8).astype(np.int32)
    src = (offsets[tgt // tile] + rng.randint(0, B, nnz)).astype(np.int64)
    w = rng.rand(nnz).astype(np.float32)
    got = native.banded_fill(tgt, src, w, Tn * tile, tile, B, offsets)
    ref = np.zeros((Tn, tile, B), np.float32)
    np.add.at(ref.reshape(-1), tgt * B + (src - offsets[tgt // tile]), w)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
