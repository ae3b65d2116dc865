"""QC-matrix block tests: SelfLayer/PairLayer equivariance and Expansion
matrix covariance M(Rx) = D M D^T."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu.models.matlayer import Expansion, PairLayer, SelfLayer
from xequinet_tpu.ops.irreps import Irreps

from .helpers import irreps_D, random_rotation, rotate_flat

IRR_IN = Irreps("4x0e+4x1o+4x2e")
IRR_HID = Irreps("4x0e+4x1e+4x1o+4x2e")
IRR_OUT = Irreps("2x0e+1x1o")


def test_selflayer_equivariance(rng):
    layer = SelfLayer(irreps_in=IRR_IN, irreps_hidden=IRR_HID)
    x = rng.normal(size=(5, IRR_IN.dim)).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(layer.apply(params, jnp.asarray(x)))

    R = random_rotation(rng)
    x_rot = rotate_flat(x, IRR_IN, R).astype(np.float32)
    out_rot = np.asarray(layer.apply(params, jnp.asarray(x_rot)))
    np.testing.assert_allclose(
        out_rot, rotate_flat(out, IRR_HID, R), rtol=1e-3, atol=1e-4
    )


def test_pairlayer_equivariance(rng):
    layer = PairLayer(irreps_in=IRR_IN, irreps_hidden=IRR_HID, edge_attr_dim=8)
    x = rng.normal(size=(5, IRR_IN.dim)).astype(np.float32)
    edge_index = jnp.asarray(np.array([[0, 1, 2, 3], [1, 2, 3, 4]]))
    edge_attr = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), edge_attr, edge_index
    )
    out = np.asarray(layer.apply(params, jnp.asarray(x), edge_attr, edge_index))
    R = random_rotation(rng)
    x_rot = rotate_flat(x, IRR_IN, R).astype(np.float32)
    out_rot = np.asarray(
        layer.apply(params, jnp.asarray(x_rot), edge_attr, edge_index)
    )
    np.testing.assert_allclose(
        out_rot, rotate_flat(out, IRR_HID, R), rtol=2e-3, atol=2e-4
    )


def test_expansion_matrix_covariance(rng):
    """The expanded block matrix must transform as D_out M D_out^T."""
    irreps_block = Irreps("4x0e+2x1e+2x2e")
    exp = Expansion(
        irreps_block=irreps_block, irreps_out=IRR_OUT, node_dim=16
    )
    x = rng.normal(size=(3, irreps_block.dim)).astype(np.float32)
    embed = rng.normal(size=(3, 16)).astype(np.float32)
    params = exp.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(embed))
    M = np.asarray(exp.apply(params, jnp.asarray(x), jnp.asarray(embed)))
    assert M.shape == (3, IRR_OUT.dim, IRR_OUT.dim)

    R = random_rotation(rng)
    x_rot = rotate_flat(x, irreps_block, R).astype(np.float32)
    M_rot = np.asarray(exp.apply(params, jnp.asarray(x_rot), jnp.asarray(embed)))
    D = irreps_D(IRR_OUT, R)
    want = np.einsum("ab,nbc,dc->nad", D, M, D)
    np.testing.assert_allclose(M_rot, want, rtol=2e-3, atol=2e-4)


def test_mat_toolkit_roundtrip(rng):
    """Pad -> blocks -> assemble must reproduce the original matrix
    (the reference's own __main__ check, mat_toolkit.py:278-295)."""
    from xequinet_tpu.utils.mat_toolkit import MatToolkit

    basis = {"H": [0], "O": [0, 0, 1]}  # sto-3g-like shell structure
    tk = MatToolkit(basis, ["H", "O"])
    at_no = np.array([1, 8, 1])
    n_orb = 1 + 5 + 1  # H:1s  O:2s+1p  H:1s
    M = rng.normal(size=(n_orb, n_orb))
    M = 0.5 * (M + M.T)
    ei = tk.get_edge_index_full(at_no)
    nb, eb = tk.get_padded_blocks(at_no, M, ei)
    node_mask, edge_mask = tk.get_mask(at_no, ei)
    assert nb.shape[1] == tk.basis_irreps.dim
    # masked-out entries are zero
    assert (nb[~node_mask.astype(bool)] == 0).all()
    back = tk.assemble_blocks(at_no, nb, eb, ei)
    np.testing.assert_allclose(back, M, atol=1e-12)
