"""Golden parity anchors for the o3 stack (VERDICT round-1 item 3).

The accuracy bar (BASELINE.md) is convention parity with PyTorch+e3nn
0.5.1 (reference nn/xpainn.py:70-75, nn/tp.py:84-98).  e3nn itself
cannot be executed here (zero egress, no installs), so these tests
anchor every convention to an INDEPENDENT exact derivation instead:

* real spherical harmonics are checked against sympy's complex Y_l^m
  (Condon-Shortley) converted by the standard real-basis formula —
  a closed-form path entirely separate from our w3j recursion
  (ops/spherical.py).  e3nn's convention is pinned by:
  m-order (-l..l), the (y,z,x) axis convention for l=1 (so callers
  permute geometric [x,y,z] -> [y,z,x]), and 'component' normalization
  (each degree scaled by sqrt(2l+1) from orthonormal).
* Wigner-3j tables are checked against the Gaunt product identity using
  those sympy-anchored harmonics (pinning the sign gauge), plus the
  e3nn normalization (unit Frobenius norm, Schur columns 1/(2l3+1)).

A convention error anywhere in the stack (SH phase/ordering, w3j gauge,
gate/TP normalization) would have to survive two independent
derivations to pass these.
"""

import math

import numpy as np
import pytest
import sympy
from sympy import I, Ynm, pi, sqrt, symbols

from xequinet_tpu.ops.irreps import Irreps
from xequinet_tpu.ops.spherical import spherical_harmonics
from xequinet_tpu.ops.wigner import wigner_3j

from .helpers import irreps_D, random_rotation

theta_s, phi_s = symbols("theta phi", real=True)


def _sympy_real_sh(l: int, theta: float, phi: float) -> np.ndarray:
    """Component-normalized real SH [2l+1] in m = -l..l order, from
    sympy's complex Ynm via the standard real-basis formula:
      m = 0 : Y_l^0
      m > 0 : sqrt(2) (-1)^m Re Y_l^m
      m < 0 : sqrt(2) (-1)^m Im Y_l^|m|
    scaled by sqrt(4 pi) (orthonormal -> component)."""
    out = []
    for m in range(-l, l + 1):
        am = abs(m)
        y = Ynm(l, am, theta_s, phi_s).expand(func=True)
        if m == 0:
            expr = y
        elif m > 0:
            expr = sqrt(2) * (-1) ** m * (y + sympy.conjugate(y)) / 2
        else:
            expr = sqrt(2) * (-1) ** am * (y - sympy.conjugate(y)) / (2 * I)
        expr = sympy.simplify(expr * sqrt(4 * pi))
        val = complex(expr.evalf(subs={theta_s: theta, phi_s: phi}))
        assert abs(val.imag) < 1e-12
        out.append(val.real)
    return np.asarray(out)


@pytest.mark.parametrize("l", [1, 2, 3, 4])
def test_sh_matches_sympy_closed_form(l, rng):
    """ops/spherical.py harmonics == exact textbook real harmonics with
    the e3nn axis convention (geometric x,y,z -> irrep basis y,z,x)."""
    ir = Irreps(f"1x{l}{'e' if (-1) ** l == 1 else 'o'}")
    for _ in range(4):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        x, y, z = v
        theta = math.acos(np.clip(z, -1, 1))
        phi = math.atan2(y, x)
        want = _sympy_real_sh(l, theta, phi)
        got = np.asarray(
            spherical_harmonics(ir, np.asarray(v)[[1, 2, 0]], normalize=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sh_component_normalization_scale(rng):
    """'component' normalization: mean square over the sphere is 1 for
    every component (so the degree block has norm sqrt(2l+1))."""
    n = 20000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for l in (1, 2, 3):
        ir = Irreps(f"1x{l}{'e' if (-1) ** l == 1 else 'o'}")
        y = np.asarray(spherical_harmonics(ir, v[:, [1, 2, 0]], normalize=True))
        np.testing.assert_allclose(
            (y**2).mean(axis=0), np.ones(2 * l + 1), rtol=5e-2
        )


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 2), (2, 1, 1), (2, 2, 2),
                                      (2, 2, 4), (3, 1, 2), (2, 1, 3)])
def test_wigner_3j_gaunt_identity(l1, l2, l3, rng):
    """Y_l3(u) is proportional to w3j-contracted Y_l1(u) x Y_l2(u) for a
    single u-independent constant: ties the w3j sign gauge to the
    sympy-anchored harmonics for every (l1,l2,l3) triple."""
    w = wigner_3j(l1, l2, l3)
    iri = lambda l: Irreps(f"1x{l}{'e' if (-1) ** l == 1 else 'o'}")
    us = rng.normal(size=(32, 3))
    us /= np.linalg.norm(us, axis=1, keepdims=True)
    uirr = us[:, [1, 2, 0]]
    y1 = np.asarray(spherical_harmonics(iri(l1), uirr, normalize=True))
    y2 = np.asarray(spherical_harmonics(iri(l2), uirr, normalize=True))
    y3 = np.asarray(spherical_harmonics(iri(l3), uirr, normalize=True))
    prod = np.einsum("na,nb,abm->nm", y1, y2, w)
    # one global proportionality constant across all samples/components
    num = (prod * y3).sum()
    den = (y3 * y3).sum()
    c = num / den
    assert abs(c) > 1e-3, "degenerate Gaunt constant"
    np.testing.assert_allclose(prod, c * y3, rtol=1e-4, atol=1e-5 * abs(c))


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 2), (2, 2, 2), (2, 1, 3),
                                      (3, 3, 2)])
def test_wigner_3j_e3nn_normalization(l1, l2, l3):
    """e3nn gauge: unit Frobenius norm; by Schur the (m1,m2)-contraction
    is then delta(m3,m3')/(2 l3 + 1)."""
    w = wigner_3j(l1, l2, l3)
    np.testing.assert_allclose((w**2).sum(), 1.0, rtol=1e-10)
    gram = np.einsum("abm,abn->mn", w, w)
    np.testing.assert_allclose(
        gram, np.eye(2 * l3 + 1) / (2 * l3 + 1), atol=1e-10
    )


def test_embedding_sh_permutation_end_to_end(rng):
    """XEmbedding applies [x,y,z] -> [y,z,x] before the harmonics
    (reference nn/xpainn.py:70-74): the l=1 block of SPHERICAL_HARMONICS
    for an edge along geometric +x must be sqrt(3) * (0, 0, 1)."""
    import jax.numpy as jnp

    from xequinet_tpu import keys
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import resolve_model
    from xequinet_tpu.models.properties import compute_edge_data

    z = np.array([1, 1], dtype=np.int32)
    pos = np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])  # edge along +x
    ei = np.array([[0, 1], [1, 0]], dtype=np.int32)
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    module, _, _ = resolve_model(
        "xpainn", node_dim=8, node_irreps="4x0e+2x1o", embed_basis="one-hot",
        num_basis=4, action_blocks=1, output_modes=["energy"],
    )
    import jax

    data = compute_edge_data({k: jnp.asarray(v) for k, v in batch.items()})
    params = module.init(jax.random.PRNGKey(0), data)["params"]
    out = module.apply({"params": params}, data)
    rsh = np.asarray(out[keys.SPHERICAL_HARMONICS])
    # edge 0: center 0, neighbor 1 -> vector = pos[0] - pos[1] = (-1.5,0,0)
    # unit geometric (-1,0,0) -> irrep (y,z,x) = (0,0,-1), x sqrt(3)
    l1_block = rsh[0, 4 : 4 + 3] / math.sqrt(3)
    np.testing.assert_allclose(l1_block, [0.0, 0.0, -1.0], atol=1e-6)


@pytest.mark.parametrize(
    "irr1,irr2,out,mode",
    [
        ("8x0e+4x1o+2x2e", "1x0e+1x1o+1x2e", "8x0e+4x1o+2x2e", "uvu"),
        ("4x0e+4x1o", "4x0e+4x1o", "8x0e+8x1o+4x2e", "uvw"),
        ("2x0e+2x1o+2x2e", "1x1o", "2x0e+2x1o+2x2e+2x3o", "uvv"),
        ("3x0e+3x1o", "3x0e+3x1o", "3x0e+3x1o+3x2e", "uuu"),
    ],
)
def test_feasible_tp_alphas_match_reference_formula(irr1, irr2, out, mode):
    """get_feasible_tp path weights == an in-test re-derivation of the
    reference algorithm (reference nn/tp.py:40-107), including its
    global-fan quirk: the normalization denominator sums the per-path
    fan over EVERY instruction, not just those sharing an output (the
    inner comprehension at nn/tp.py:95 shadows `ins`)."""
    from xequinet_tpu.ops.irreps import Irrep
    from xequinet_tpu.ops.tensor_product import get_feasible_tp

    i1, i2, fout = Irreps(irr1), Irreps(irr2), Irreps(out)

    # independent re-derivation, following the reference text
    mid: list = []
    ins: list = []
    for i, (m1, ir1) in enumerate(i1):
        for j, (m2, ir2) in enumerate(i2):
            for l3 in range(abs(ir1.l - ir2.l), ir1.l + ir2.l + 1):
                ir3 = Irrep(l3, ir1.p * ir2.p)
                if ir3 not in fout:
                    continue
                mul_out = {
                    "uvw": fout.count(ir3), "uvu": m1, "uvv": m2,
                    "uuu": m1,
                }[mode]
                key = (mul_out, ir3)
                k = mid.index(key) if key in mid else len(mid)
                if k == len(mid):
                    mid.append(key)
                ins.append((i, j, k))
    fan = {
        "uvw": lambda i, j: i1[i].mul * i2[j].mul,
        "uvu": lambda i, j: i2[j].mul,
        "uvv": lambda i, j: i1[i].mul,
        "uuu": lambda i, j: 1,
    }[mode]
    x_total = sum(fan(i, j) for (i, j, _) in ins)
    want = []
    for (i, j, k) in ins:
        alpha = mid[k][1].dim / x_total
        want.append((i, j, k, math.sqrt(alpha)))
    mid_irreps = Irreps(mid)
    sorted_mid, perm, _ = mid_irreps.sort()
    want = sorted(
        [(i, j, perm[k], a) for (i, j, k, a) in want],
        key=lambda t: (t[2], t[0], t[1]),
    )

    got_irreps, got_ins = get_feasible_tp(irr1, irr2, out, mode)
    got = sorted(
        [(g.i_in1, g.i_in2, g.i_out, g.path_weight) for g in got_ins],
        key=lambda t: (t[2], t[0], t[1]),
    )
    assert str(got_irreps) == str(sorted_mid)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        np.testing.assert_allclose(g[3], w[3], rtol=1e-12)


def test_o3_linear_matches_explicit_formula(rng):
    """O3Linear == the e3nn o3.Linear semantics computed by hand from the
    extracted parameters: per output irrep, sum over matching-irrep input
    blocks of w[u,v] x[u,m], scaled by 1/sqrt(total fan-in); biases only
    on even scalars (reference usage nn/xpainn.py:186-187)."""
    import jax
    import jax.numpy as jnp

    from xequinet_tpu.models.o3layer import O3Linear

    irr_in = Irreps("6x0e+4x1o+2x2e+3x0e")
    irr_out = Irreps("5x0e+3x1o+2x2e")
    lin = O3Linear(irr_in, irr_out, biases=True)
    x = rng.normal(size=(7, irr_in.dim)).astype(np.float64)
    params = lin.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    got = np.asarray(lin.apply({"params": params}, jnp.asarray(x)))

    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    sl_in = irr_in.slices()
    want_chunks = []
    for i_out, (mul_out, ir_out) in enumerate(irr_out):
        paths = [
            (i_in, mi) for i_in, mi in enumerate(irr_in) if mi.ir == ir_out
        ]
        fan = sum(mi.mul for _, mi in paths)
        acc = np.zeros((x.shape[0], mul_out, ir_out.dim))
        for i_in, mi in paths:
            xc = x[:, sl_in[i_in]].reshape(-1, mi.mul, ir_out.dim)
            acc += np.einsum("bum,uv->bvm", xc, p[f"w{i_out}_{i_in}"])
        acc /= math.sqrt(fan)
        if ir_out.l == 0 and ir_out.p == 1:
            acc = acc + p[f"b{i_out}"][None, :, None]
        want_chunks.append(acc.reshape(x.shape[0], -1))
    want = np.concatenate(want_chunks, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("l", [0, 1, 2, 3])
def test_scalar_gating_is_exact_elementwise_product(l, rng):
    """e3nn's ElementwiseTensorProduct(scalars, irreps) reduces to an
    exact elementwise multiply: w3j(0,l,l) = I/sqrt(2l+1) cancels the
    component normalization sqrt(2l+1) (reference gating at
    nn/xpainn.py:150-156).  Pins both the w3j(0,l,l) closed form and
    scalar_gate's semantics."""
    w = wigner_3j(0, l, l)
    np.testing.assert_allclose(
        w[0], np.eye(2 * l + 1) / math.sqrt(2 * l + 1), atol=1e-12
    )

    import jax.numpy as jnp

    from xequinet_tpu.ops.o3ops import scalar_gate

    irreps = Irreps(f"4x{l}{'e' if l % 2 == 0 else 'o'}")
    x = rng.normal(size=(5, irreps.dim))
    g = rng.normal(size=(5, 4))
    got = np.asarray(scalar_gate(jnp.asarray(x), jnp.asarray(g), irreps))
    want = (x.reshape(5, 4, 2 * l + 1) * g[:, :, None]).reshape(5, -1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("l", [0, 1, 2, 3, 4])
def test_w3j_llo_is_positive_identity(l):
    """w3j(l,l,0)[m,m',0] == +delta_{mm'} / sqrt(2l+1).

    The SIGN is a load-bearing convention: the reference's Invariant
    (nn/o3layer.py:11-44) takes sqrt of the uuu self-product, so e3nn's
    real-basis w3j(l,l,0) must be positive for every l — a negative
    coupling would NaN it."""
    from xequinet_tpu.ops.wigner import wigner_3j

    w = np.asarray(wigner_3j(l, l, 0))[:, :, 0]
    np.testing.assert_allclose(
        w, np.eye(2 * l + 1) / math.sqrt(2 * l + 1), atol=1e-12
    )


def test_invariant_dot_closed_form(rng):
    """Invariant / EquivariantDot == the closed forms the reference's uuu
    component-normalized TensorProduct reduces to (nn/o3layer.py:11-109):
    dot_u = sum_m x1[u,m] x2[u,m] / sqrt(2l+1);
    inv_u = sqrt(dot_uu + eps^2) - eps."""
    from xequinet_tpu.ops.o3ops import equivariant_dot, invariant

    irr = Irreps("3x0e+2x1o+2x2e")
    x1 = rng.normal(size=(5, irr.dim))
    x2 = rng.normal(size=(5, irr.dim))
    got_dot = np.asarray(equivariant_dot(x1, x2, irr))
    want = []
    off = 0
    for mul, ir in irr:
        d = ir.dim
        a = x1[:, off : off + mul * d].reshape(5, mul, d)
        b = x2[:, off : off + mul * d].reshape(5, mul, d)
        want.append((a * b).sum(-1) / math.sqrt(d))
        off += mul * d
    want = np.concatenate(want, axis=-1)
    np.testing.assert_allclose(got_dot, want, rtol=1e-6, atol=1e-7)

    eps = 1e-5
    got_inv = np.asarray(invariant(x1, irr, eps=eps))
    want_inv = np.sqrt(
        np.concatenate(
            [
                (x1[:, o : o + m * (2 * l_ + 1)].reshape(5, m, -1) ** 2).sum(-1)
                / math.sqrt(2 * l_ + 1)
                for (o, m, l_) in _irrep_offsets(irr)
            ],
            axis=-1,
        )
        + eps * eps
    ) - eps
    np.testing.assert_allclose(got_inv, want_inv, rtol=1e-6, atol=1e-7)


def _irrep_offsets(irr):
    off = 0
    out = []
    for mul, ir in irr:
        out.append((off, mul, ir.l))
        off += mul * ir.dim
    return out


def test_equivariant_layer_norm_matches_reference_math(rng):
    """EquivariantLayerNorm == an independent numpy transcription of the
    reference forward (nn/o3layer.py:112-171): mean-center the 0e
    channels, divide by 1/sqrt(mean_u(inv_sq_u) + eps), per-irrep affine
    weight via elementwise 0e product, bias on 0e channels."""
    import jax
    import jax.numpy as jnp

    from xequinet_tpu.models.o3layer import EquivariantLayerNorm

    irr = Irreps("4x0e+3x1o+2x2e")
    x = rng.normal(size=(6, irr.dim))
    ln = EquivariantLayerNorm(irreps=irr)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # non-trivial affine parameters
    params = {
        "weight": jnp.asarray(rng.normal(size=irr.num_irreps) * 0.5 + 1.0),
        "bias": jnp.asarray(rng.normal(size=4) * 0.1),
    }
    got = np.asarray(ln.apply({"params": params}, jnp.asarray(x)))

    w = np.asarray(params["weight"], np.float64)
    b = np.asarray(params["bias"], np.float64)
    eps = 1e-5
    xs = x.astype(np.float64).copy()
    # scalar (0e) channels are the first 4 columns here
    xs[:, :4] -= xs[:, :4].mean(axis=1, keepdims=True)
    inv_sq = []
    for (o, m, l_) in _irrep_offsets(irr):
        d = 2 * l_ + 1
        inv_sq.append(
            (xs[:, o : o + m * d].reshape(6, m, d) ** 2).sum(-1)
            / math.sqrt(d)
        )
    inv_sq = np.concatenate(inv_sq, axis=-1)  # [6, num_irreps]
    rms_inv = 1.0 / np.sqrt(inv_sq.mean(axis=1, keepdims=True) + eps)
    xs = xs * rms_inv
    # per-irrep affine weight, expanded over m components
    w_exp = []
    k = 0
    for (o, m, l_) in _irrep_offsets(irr):
        d = 2 * l_ + 1
        w_exp.append(np.repeat(w[k : k + m], d))
        k += m
    xs = xs * np.concatenate(w_exp)[None, :]
    xs[:, :4] += b[None, :]
    np.testing.assert_allclose(got, xs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# rank-2 Cartesian tensor basis (round 4: first-principles checks of the
# Sph2Cart path used by PolarOut/CartTensorOut — a consistently-wrong
# basis would pass flattened rotation-equivariance tests, VERDICT r3
# weak #4)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("formula", ["ij", "ij=ji"])
def test_reduced_tensor_basis_cartesian_equivariance(formula, rng):
    """Q must intertwine the irreps action with the TENSOR action:
    Q^T (D(R) x) = (R_ir (x) R_ir) Q^T x, i.e. the claimed Cartesian
    output transforms as a true rank-2 tensor."""
    from xequinet_tpu.ops.cartesian import reduced_tensor_basis
    from xequinet_tpu.ops.wigner import geometric_rotation_to_irrep_basis

    irreps, Q = reduced_tensor_basis(formula)
    R = random_rotation(rng)
    R_ir = geometric_rotation_to_irrep_basis(R)
    D = irreps_D(irreps, R)
    x = rng.normal(size=(irreps.dim,))
    lhs = (D @ x) @ Q
    rhs = np.kron(R_ir, R_ir) @ (x @ Q)
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_reduced_tensor_basis_symmetric_structure(rng):
    """'ij=ji' decomposes as 0e+2e with the scalar along the identity;
    'ij' additionally carries the antisymmetric 1e block."""
    from xequinet_tpu.ops.cartesian import reduced_tensor_basis
    from xequinet_tpu.ops.irreps import Irreps

    irreps, Q = reduced_tensor_basis("ij=ji")
    assert Irreps(irreps).ls == [0, 2]
    # every basis tensor is symmetric
    for row in Q:
        T = row.reshape(3, 3)
        np.testing.assert_allclose(T, T.T, atol=1e-12)
    # the l=0 row is proportional to the identity
    t0 = Q[0].reshape(3, 3)
    np.testing.assert_allclose(t0, np.eye(3) * t0[0, 0], atol=1e-12)
    assert abs(abs(t0[0, 0]) - 1 / np.sqrt(3)) < 1e-12  # orthonormal row

    irreps_f, Qf = reduced_tensor_basis("ij")
    assert Irreps(irreps_f).ls == [0, 1, 2]
    # the l=1 rows are antisymmetric tensors
    off = 1
    for k in range(3):
        T = Qf[off + k].reshape(3, 3)
        np.testing.assert_allclose(T, -T.T, atol=1e-12)


def test_cart_tensor_roll_gives_geometric_tensor(rng):
    """The head's [y,z,x] -> [x,y,z] roll composed with Sph2Cart must
    produce a tensor that transforms with the GEOMETRIC rotation:
    T(D x) = R T(x) R^T (reference nn/output.py:459-461 convention)."""
    from xequinet_tpu.ops.cartesian import reduced_tensor_basis

    irreps, Q = reduced_tensor_basis("ij=ji")

    def cart_geometric(x):
        T = (x @ Q).reshape(3, 3)
        # [y,z,x] -> [x,y,z] on both axes (the head's jnp.roll(shift=1))
        T = np.roll(T, 1, axis=0)
        return np.roll(T, 1, axis=1)

    R = random_rotation(rng)
    D = irreps_D(irreps, R)
    x = rng.normal(size=(irreps.dim,))
    lhs = cart_geometric(D @ x)
    rhs = R @ cart_geometric(x) @ R.T
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
