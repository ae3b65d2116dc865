"""Unit tests for the o3 core: wigner tables, spherical harmonics,
tensor products, fast primitives.  These encode the e3nn conventions the
reference depends on (SURVEY.md §7.3 hard part #1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu.ops.irreps import Irrep, Irreps
from xequinet_tpu.ops.o3ops import (
    equivariant_dot,
    equivariant_layer_norm,
    invariant,
    scalar_gate,
)
from xequinet_tpu.ops.spherical import spherical_harmonics
from xequinet_tpu.ops.tensor_product import (
    Instruction,
    TensorProduct,
    get_feasible_tp,
)
from xequinet_tpu.ops.wigner import (
    geometric_rotation_to_irrep_basis,
    irrep_inner_coeff,
    wigner_3j,
    wigner_D,
)

from .helpers import irreps_D, random_rotation, rotate_flat


# ---------------------------------------------------------------------------
# Irreps metadata
# ---------------------------------------------------------------------------
def test_irreps_parse():
    irr = Irreps("128x0e + 64x1o + 32x2e")
    assert irr.dim == 128 + 64 * 3 + 32 * 5
    assert irr.num_irreps == 128 + 64 + 32
    assert irr.lmax == 2
    assert str(irr) == "128x0e+64x1o+32x2e"
    assert Irreps(irr) == irr
    assert irr.count("1o") == 64
    assert Irrep.parse("2e") in irr


def test_irrep_product_selection_rule():
    prods = list(Irrep(1, -1) * Irrep(1, -1))
    assert prods == [Irrep(0, 1), Irrep(1, 1), Irrep(2, 1)]


# ---------------------------------------------------------------------------
# Wigner 3j
# ---------------------------------------------------------------------------
def test_wigner_3j_known_values():
    w = wigner_3j(1, 1, 0)
    np.testing.assert_allclose(w[:, :, 0], np.eye(3) / np.sqrt(3), atol=1e-12)
    w = wigner_3j(1, 0, 1)
    np.testing.assert_allclose(w[:, 0, :], np.eye(3) / np.sqrt(3), atol=1e-12)
    w = wigner_3j(2, 2, 0)
    np.testing.assert_allclose(w[:, :, 0], np.eye(5) / np.sqrt(5), atol=1e-12)


@pytest.mark.parametrize("lll", [(1, 1, 1), (1, 1, 2), (2, 1, 2), (2, 2, 2), (2, 1, 3)])
def test_wigner_3j_equivariance(lll, rng):
    """w3j is invariant under simultaneous rotation of all three indices."""
    l1, l2, l3 = lll
    R = geometric_rotation_to_irrep_basis(random_rotation(rng))
    D1, D2, D3 = wigner_D(l1, R), wigner_D(l2, R), wigner_D(l3, R)
    C = wigner_3j(l1, l2, l3)
    C_rot = np.einsum("ia,jb,kc,abc->ijk", D1, D2, D3, C)
    np.testing.assert_allclose(C_rot, C, atol=1e-8)
    assert abs(np.linalg.norm(C) - 1.0) < 1e-12


def test_wigner_D_is_representation(rng):
    R1, R2 = random_rotation(rng), random_rotation(rng)
    for l in (1, 2, 3):
        r1 = geometric_rotation_to_irrep_basis(R1)
        r2 = geometric_rotation_to_irrep_basis(R2)
        r12 = geometric_rotation_to_irrep_basis(R1 @ R2)
        D = wigner_D(l, r12)
        np.testing.assert_allclose(D, wigner_D(l, r1) @ wigner_D(l, r2), atol=1e-9)
        np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-9)


def test_wigner_D_l1_is_rotation_itself(rng):
    R = random_rotation(rng)
    r = geometric_rotation_to_irrep_basis(R)
    np.testing.assert_allclose(wigner_D(1, r), r, atol=1e-10)


# ---------------------------------------------------------------------------
# Spherical harmonics
# ---------------------------------------------------------------------------
def test_sh_l1_identity(rng):
    """Component-normalized l=1 SH of a unit vector is sqrt(3) * the vector."""
    v = rng.normal(size=(7, 3))
    u = v / np.linalg.norm(v, axis=-1, keepdims=True)
    y = np.asarray(spherical_harmonics("1x1o", jnp.asarray(v), normalize=True))
    np.testing.assert_allclose(y, np.sqrt(3.0) * u, atol=1e-6)


def test_sh_l2_explicit_formulas(rng):
    """Match the e3nn generated polynomials for l=2 ('norm' normalization):
    with input components (x,y,z) (already permuted to the irrep basis),
    sh2 = [√3 xz, √3 xy, y² − (x²+z²)/2, √3 yz, √3/2 (z²−x²)]."""
    v = rng.normal(size=(11, 3))
    u = v / np.linalg.norm(v, axis=-1, keepdims=True)
    x, y, z = u[:, 0], u[:, 1], u[:, 2]
    s3 = np.sqrt(3.0)
    expected = np.stack(
        [
            s3 * x * z,
            s3 * x * y,
            y**2 - 0.5 * (x**2 + z**2),
            s3 * y * z,
            0.5 * s3 * (z**2 - x**2),
        ],
        axis=-1,
    )
    got = np.asarray(
        spherical_harmonics("1x2e", jnp.asarray(v), normalize=True, normalization="norm")
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("l", [1, 2, 3, 4])
def test_sh_equivariance(l, rng):
    """Y_l(R v) = D_l(R) Y_l(v) with our own Wigner D."""
    R = random_rotation(rng)
    r = geometric_rotation_to_irrep_basis(R)
    D = wigner_D(l, r)
    v = rng.normal(size=(16, 3))
    ir = f"1x{l}{'o' if l % 2 else 'e'}"
    y = np.asarray(spherical_harmonics(ir, jnp.asarray(v)))
    # rotate in the irrep basis (vectors live in (y,z,x) order here)
    y_rot = np.asarray(spherical_harmonics(ir, jnp.asarray(v @ r.T)))
    np.testing.assert_allclose(y_rot, y @ D.T, atol=1e-5)


def test_sh_norm_constant_on_sphere(rng):
    v = rng.normal(size=(64, 3))
    for l in (1, 2, 3, 4):
        ir = f"1x{l}{'o' if l % 2 else 'e'}"
        y = np.asarray(spherical_harmonics(ir, jnp.asarray(v), normalization="component"))
        norms = np.linalg.norm(y, axis=-1)
        np.testing.assert_allclose(norms, np.sqrt(2 * l + 1), atol=1e-5)


def test_sh_multiplicity_tiling(rng):
    v = rng.normal(size=(5, 3))
    y1 = np.asarray(spherical_harmonics("1x0e+1x1o", jnp.asarray(v)))
    y = np.asarray(spherical_harmonics("2x0e+3x1o", jnp.asarray(v)))
    assert y.shape == (5, 2 + 9)
    np.testing.assert_allclose(y[:, 0], y1[:, 0])
    np.testing.assert_allclose(y[:, 1], y1[:, 0])
    np.testing.assert_allclose(y[:, 2:5], y1[:, 1:4])
    np.testing.assert_allclose(y[:, 5:8], y1[:, 1:4])


def test_sh_zero_vector_padding():
    v = jnp.zeros((3, 3))
    y = np.asarray(spherical_harmonics("1x0e+1x1o+1x2e", v))
    np.testing.assert_allclose(y[:, 1:], 0.0)  # l>=1 vanish on padding edges


# ---------------------------------------------------------------------------
# Fast primitives
# ---------------------------------------------------------------------------
IRR = Irreps("4x0e+3x1o+2x2e")


def test_invariant_value(rng):
    x = rng.normal(size=(6, IRR.dim)).astype(np.float32)
    out = np.asarray(invariant(jnp.asarray(x), IRR, squared=True))
    assert out.shape == (6, IRR.num_irreps)
    # scalar part: c_0 = 1 -> x^2
    np.testing.assert_allclose(out[:, :4], x[:, :4] ** 2, rtol=1e-5)
    # l=1 part: |x|^2 / sqrt(3)
    v = x[:, 4:13].reshape(6, 3, 3)
    np.testing.assert_allclose(
        out[:, 4:7], (v**2).sum(-1) / np.sqrt(3.0), rtol=1e-5
    )


def test_invariant_rotation_invariance(rng):
    x = rng.normal(size=(6, IRR.dim)).astype(np.float64)
    R = random_rotation(rng)
    xr = rotate_flat(x, IRR, R)
    a = np.asarray(invariant(jnp.asarray(x), IRR))
    b = np.asarray(invariant(jnp.asarray(xr), IRR))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_equivariant_dot_invariance(rng):
    x = rng.normal(size=(6, IRR.dim))
    y = rng.normal(size=(6, IRR.dim))
    R = random_rotation(rng)
    a = np.asarray(equivariant_dot(jnp.asarray(x), jnp.asarray(y), IRR))
    b = np.asarray(
        equivariant_dot(
            jnp.asarray(rotate_flat(x, IRR, R)), jnp.asarray(rotate_flat(y, IRR, R)), IRR
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_scalar_gate_equivariance(rng):
    x = rng.normal(size=(6, IRR.dim))
    s = rng.normal(size=(6, IRR.num_irreps))
    R = random_rotation(rng)
    out = np.asarray(scalar_gate(jnp.asarray(x), jnp.asarray(s), IRR))
    out_rot = np.asarray(
        scalar_gate(jnp.asarray(rotate_flat(x, IRR, R)), jnp.asarray(s), IRR)
    )
    np.testing.assert_allclose(out_rot, rotate_flat(out, IRR, R), atol=1e-6)


def test_scalar_gate_matches_manual():
    x = jnp.arange(IRR.dim, dtype=jnp.float32)[None]
    s = jnp.ones((1, IRR.num_irreps)) * 2.0
    np.testing.assert_allclose(np.asarray(scalar_gate(x, s, IRR)), 2 * np.asarray(x))


def test_equivariant_layer_norm(rng):
    x = rng.normal(size=(6, IRR.dim)).astype(np.float32) * 3 + 1
    w = jnp.ones((IRR.num_irreps,))
    b = jnp.zeros((4,))
    out = np.asarray(equivariant_layer_norm(jnp.asarray(x), IRR, w, b))
    assert out.shape == x.shape
    # scalar channels are mean-centered
    np.testing.assert_allclose(out[:, :4].mean(axis=1), 0.0, atol=1e-5)
    # equivariance under rotation
    R = random_rotation(rng)
    out_rot = np.asarray(
        equivariant_layer_norm(jnp.asarray(rotate_flat(x, IRR, R)), IRR, w, b)
    )
    np.testing.assert_allclose(out_rot, rotate_flat(out, IRR, R), atol=1e-4)


# ---------------------------------------------------------------------------
# Generic tensor product
# ---------------------------------------------------------------------------
def test_tp_invariant_equivalence(rng):
    """uuu TP with path_weight=ir.dim reproduces the fast invariant
    (reference nn/o3layer.py:23-29 construction)."""
    irr = Irreps("4x0e+3x1o+2x2e")
    irreps_out = Irreps([(mul, (0, 1)) for mul, ir in irr])
    instr = [
        Instruction(i, i, i, "uuu", False, ir.dim)
        for i, (mul, ir) in enumerate(irr)
    ]
    tp = TensorProduct(irr, irr, irreps_out, instr)
    x = jnp.asarray(rng.normal(size=(5, irr.dim)), dtype=jnp.float32)
    got = np.asarray(tp(x, x))
    want = np.asarray(invariant(x, irr, squared=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_tp_equivariance_uvw(rng):
    irr1 = Irreps("2x0e+2x1o")
    irr2 = Irreps("1x1o")
    irreps_out, instr = get_feasible_tp(irr1, irr2, Irreps("4x0e+4x1e+4x2e"), "uvw")
    tp = TensorProduct(irr1, irr2, irreps_out, instr)
    w = jnp.asarray(rng.normal(size=(tp.weight_numel,)), dtype=jnp.float32)
    x1 = rng.normal(size=(6, irr1.dim))
    x2 = rng.normal(size=(6, irr2.dim))
    out = np.asarray(tp(jnp.asarray(x1, dtype=jnp.float32), jnp.asarray(x2, dtype=jnp.float32), w))

    R = random_rotation(rng)
    out_rot = np.asarray(
        tp(
            jnp.asarray(rotate_flat(x1, irr1, R), dtype=jnp.float32),
            jnp.asarray(rotate_flat(x2, irr2, R), dtype=jnp.float32),
            w,
        )
    )
    np.testing.assert_allclose(out_rot, rotate_flat(out, irreps_out, R), atol=1e-4)


def test_tp_variance_normalization(rng):
    """Component normalization: unit-variance inputs -> O(1)-variance output."""
    irr = Irreps("8x1o")
    irreps_out, instr = get_feasible_tp(irr, irr, Irreps("8x0e+8x1e+8x2e"), "uuu")
    tp = TensorProduct(irr, irr, irreps_out, instr)
    n = 2000
    x1 = jnp.asarray(rng.normal(size=(n, irr.dim)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n, irr.dim)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, tp.weight_numel)), dtype=jnp.float32)
    out = np.asarray(tp(x1, x2, w))
    var = out.var()
    assert 0.05 < var < 20.0, var


def test_get_feasible_tp_structure():
    irr = Irreps("8x0e+8x1o+8x2e")
    irreps_out, instr = get_feasible_tp(irr, irr, Irreps("8x0e+8x1e+8x2e"), "uuu")
    assert all(ins.mode == "uuu" for ins in instr)
    assert irreps_out.num_irreps > 0
    # sorted output irreps
    ls = [mi.ir.l for mi in irreps_out]
    assert ls == sorted(ls)


def test_parity_inversion(rng):
    """Under inversion, SH flip by (-1)^l and odd node irreps negate;
    gated products preserve this."""
    v = rng.normal(size=(6, 3))
    for l in (1, 2, 3):
        ir = f"1x{l}{'o' if l % 2 else 'e'}"
        y = np.asarray(spherical_harmonics(ir, jnp.asarray(v)))
        y_inv = np.asarray(spherical_harmonics(ir, jnp.asarray(-v)))
        np.testing.assert_allclose(y_inv, (-1) ** l * y, atol=1e-6)
    # invariant() is parity-invariant
    x = rng.normal(size=(4, IRR.dim))
    D_inv = irreps_D(IRR, np.eye(3), parity=True)  # pure inversion
    a = np.asarray(invariant(jnp.asarray(x), IRR))
    b = np.asarray(invariant(jnp.asarray(x @ D_inv.T), IRR))
    np.testing.assert_allclose(a, b, atol=1e-6)
