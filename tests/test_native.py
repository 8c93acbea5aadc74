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

def test_banded_fill_raises_on_out_of_band():
    """Out-of-band entries must be a hard error (both backends), never a
    silent drop — a dropped entry loses a mesh edge (ADVICE r1)."""
    import numpy as np
    import pytest
    from gnn_fluid_dynamics_tpu import native
    if not native.native_available():
        pytest.skip("no native toolchain")
    tgt = np.array([0], np.int64)
    src = np.array([200], np.int64)          # band [0, 128) -> col 200 OOB
    w = np.ones(1, np.float32)
    offsets = np.zeros(1, np.int32)
    with pytest.raises(ValueError, match="outside band"):
        native.banded_fill(tgt, src, w, 128, 128, 128, offsets)


def test_build_table_unaligned_lo_wide_span():
    """Regression for the round-1 band-width bug: when the widest tile's raw
    span is exactly a 128 multiple but starts at an unaligned row, the
    8-aligned offset widens the needed band past B; entries were silently
    dropped. The width must be measured from the aligned starts."""
    import numpy as np
    from gnn_fluid_dynamics_tpu.ops.banded import _build_table, banded_matmul

    S = 256
    # one tile; sources span [5, 132]: raw width 128, aligned start 0 needs 133
    tgt = np.arange(128, dtype=np.int64)
    src = (5 + (np.arange(128, dtype=np.int64) % 128)).astype(np.int64)
    src[-1] = 132
    w = np.ones(128, np.float32)
    offsets, onehot = _build_table(tgt, src, w, 128, S)
    # every entry must be present in the table
    assert onehot.sum() == 128.0
    x = np.random.RandomState(0).rand(S, 8).astype(np.float32)
    spec = ((onehot.shape[0], S, offsets),)
    out = np.asarray(banded_matmul(
        np.asarray(onehot), spec, np.asarray(x)))[:128]
    ref = np.zeros((128, 8), np.float32)
    np.add.at(ref, tgt, x[src])
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
