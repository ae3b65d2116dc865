"""Mega message kernel (ops/pallas_message): interpreter-mode correctness
against the XLA reference and the plain XLA model path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import (
    init_params,
    make_apply_forward,
    resolve_model,
)
from xequinet_tpu.ops.irreps import Irreps
from xequinet_tpu.ops.pallas_message import (
    _mega_call,
    _structure_matrices,
    pack_edge_features,
    xla_reference,
)
from xequinet_tpu.ops.pallas_scatter_v2 import prepare_v2

IRREPS = "16x0e+8x1o+4x2e"
NB = 8
SD = 16  # node_dim


def _slot_problem(rng, bn=8, chunk=8, pad_nodes=16):
    from tests.test_pallas_v2 import molecule_edges

    src, dst, n = molecule_edges(rng, n_mols=6, lo=4, hi=9)
    n_pad = max(((n + bn - 1) // bn) * bn, bn + 2 * pad_nodes + 8)
    (src2, dst2, sel, cb, nc, ws, window, mx) = prepare_v2(
        src, dst, n_pad, bn, chunk, pad_nodes
    )
    total = len(sel)
    valid = sel >= 0
    safe = np.clip(sel, 0, None)
    # padding slots carry the owning block's boundary node so dst stays
    # sorted (same convention as collate's _apply_kernel_layout)
    slot_chunk = np.arange(total) // chunk
    block_id = np.searchsorted(cb, slot_chunk, side="right") - 1
    pad_center = np.minimum((block_id + 1) * bn, n_pad - 1)
    src_g = np.where(valid, src[safe], pad_center).astype(np.int32)
    dst_g = np.where(valid, dst[safe], pad_center).astype(np.int32)
    assert (np.diff(dst_g) >= 0).all()
    return (src2, dst2, src_g, dst_g, cb, nc, ws, window, mx, valid,
            n_pad, total, bn, chunk)


def test_mega_kernel_matches_xla_reference(rng):
    (src2, dst2, src_g, dst_g, cb, nc, ws, window, mx, valid,
     n_pad, total, bn, chunk) = _slot_problem(rng)
    irreps = Irreps(IRREPS)
    _, _, _, _, (h, hp, d, dp, sdp, n_y) = _structure_matrices(IRREPS, NB, SD)

    x_cat = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    # zero the padding lanes like the model does
    x_cat[:, h:hp] = 0.0
    x_cat[:, hp + d :] = 0.0
    rbf = rng.normal(size=(total, NB)).astype(np.float32)
    fcut = rng.uniform(0.1, 1.0, size=(total, 1)).astype(np.float32)
    vec = rng.normal(size=(total, 3)).astype(np.float32)
    ef = np.asarray(pack_edge_features(
        jnp.asarray(rbf), jnp.asarray(fcut), jnp.asarray(vec), irreps
    ))
    wf_aug = np.zeros((128, hp), dtype=np.float32)
    wf_aug[: NB + 1, :h] = rng.normal(size=(NB + 1, h)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        out = _mega_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws),
            IRREPS, NB, SD, n_pad, bn, chunk, window, mx, "float32",
        )
    want = xla_reference(
        jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
        jnp.asarray(src_g), jnp.asarray(dst_g), jnp.asarray(valid),
        IRREPS, NB, SD, n_pad,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_mega_bwd_kernel_matches_xla_vjp(rng):
    """Backward kernel (dx, d_ef, d_wf) == jax.vjp of the XLA reference."""
    from xequinet_tpu.ops.pallas_message import _mega_bwd_call

    (src2, dst2, src_g, dst_g, cb, nc, ws, window, mx, valid,
     n_pad, total, bn, chunk) = _slot_problem(rng)
    irreps = Irreps(IRREPS)
    _, _, _, _, (h, hp, d, dp, sdp, n_y) = _structure_matrices(IRREPS, NB, SD)

    x_cat = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    x_cat[:, h:hp] = 0.0
    x_cat[:, hp + d :] = 0.0
    rbf = rng.normal(size=(total, NB)).astype(np.float32)
    fcut = rng.uniform(0.1, 1.0, size=(total, 1)).astype(np.float32)
    vec = rng.normal(size=(total, 3)).astype(np.float32)
    ef = np.asarray(pack_edge_features(
        jnp.asarray(rbf), jnp.asarray(fcut), jnp.asarray(vec), irreps
    ))
    wf_aug = np.zeros((128, hp), dtype=np.float32)
    wf_aug[: NB + 1, :h] = rng.normal(size=(NB + 1, h)).astype(np.float32)
    g = rng.normal(size=(n_pad, sdp + dp)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda x, e, w: xla_reference(
            x, e, w, jnp.asarray(src_g), jnp.asarray(dst_g),
            jnp.asarray(valid), IRREPS, NB, SD, n_pad,
        ),
        jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
    )
    want_dx, want_def, want_dwf = vjp(jnp.asarray(g))

    with pltpu.force_tpu_interpret_mode():
        dx, def_, dwf = _mega_bwd_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(g),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws),
            IRREPS, NB, SD, n_pad, bn, chunk, window, mx, "float32",
        )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(want_dwf),
                               rtol=1e-4, atol=1e-4)
    # d_ef on padding slots is zero by construction in the kernel; the XLA
    # vjp also zeroes them through the mask
    np.testing.assert_allclose(np.asarray(def_), np.asarray(want_def),
                               rtol=1e-4, atol=1e-4)


def test_mega_bwd2_kernel_matches_xla_vjp2(rng):
    """Second-order kernel (d2x, d2ef, d2wf, d2g) == jax.vjp of the XLA
    backward — force training's grad-of-grad path."""
    from xequinet_tpu.ops.pallas_message import _mega_bwd2_call

    (src2, dst2, src_g, dst_g, cb, nc, ws, window, mx, valid,
     n_pad, total, bn, chunk) = _slot_problem(rng)
    irreps = Irreps(IRREPS)
    _, _, _, _, (h, hp, d, dp, sdp, n_y) = _structure_matrices(IRREPS, NB, SD)

    x_cat = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    x_cat[:, h:hp] = 0.0
    x_cat[:, hp + d :] = 0.0
    rbf = rng.normal(size=(total, NB)).astype(np.float32)
    fcut = rng.uniform(0.1, 1.0, size=(total, 1)).astype(np.float32)
    vec = rng.normal(size=(total, 3)).astype(np.float32)
    ef = np.asarray(pack_edge_features(
        jnp.asarray(rbf), jnp.asarray(fcut), jnp.asarray(vec), irreps
    ))
    wf_aug = np.zeros((128, hp), dtype=np.float32)
    wf_aug[: NB + 1, :h] = rng.normal(size=(NB + 1, h)).astype(np.float32)
    g = rng.normal(size=(n_pad, sdp + dp)).astype(np.float32)
    # incoming cotangents on (dx, def, dwf)
    cx = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    cef = rng.normal(size=(total, 128)).astype(np.float32)
    cwf = rng.normal(size=(128, hp)).astype(np.float32)

    def xla_bwd(x, e, w, gg):
        _, vjp = jax.vjp(
            lambda xx, ee, ww: xla_reference(
                xx, ee, ww, jnp.asarray(src_g), jnp.asarray(dst_g),
                jnp.asarray(valid), IRREPS, NB, SD, n_pad,
            ),
            x, e, w,
        )
        return vjp(gg)

    _, vjp2 = jax.vjp(
        xla_bwd, jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
        jnp.asarray(g),
    )
    want_dx2, want_def2, want_dwf2, want_dg2 = vjp2(
        (jnp.asarray(cx), jnp.asarray(cef), jnp.asarray(cwf))
    )

    with pltpu.force_tpu_interpret_mode():
        dx2, def2, dwf2, dg2 = _mega_bwd2_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(g), jnp.asarray(cx), jnp.asarray(cef),
            jnp.asarray(cwf),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws),
            IRREPS, NB, SD, n_pad, bn, chunk, window, mx, "float32",
        )
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(want_dx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwf2), np.asarray(want_dwf2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dg2), np.asarray(want_dg2),
                               rtol=1e-4, atol=1e-4)
    # d2ef: the XLA vjp zeroes padding slots through the mask; the kernel
    # zeroes them through the gms factors — compare on real slots, assert
    # padding-slot rows are zero
    np.testing.assert_allclose(np.asarray(def2)[valid],
                               np.asarray(want_def2)[valid],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(def2)[~valid], 0.0, atol=1e-5)


def test_structure_matrices_match_scalar_gate(rng):
    """E1/E2/BY reproduce scalar_gate + SH broadcasting exactly."""
    from xequinet_tpu.ops.o3ops import scalar_gate
    from xequinet_tpu.ops.spherical import spherical_harmonics

    irreps = Irreps(IRREPS)
    e1, e2, ms, by, (h, hp, d, dp, sdp, n_y) = _structure_matrices(
        IRREPS, NB, SD
    )
    ni = irreps.num_irreps
    x = rng.normal(size=(5, d)).astype(np.float32)
    g = rng.normal(size=(5, ni)).astype(np.float32)
    fo = np.zeros((5, hp), dtype=np.float32)
    fo[:, :ni] = g
    want = scalar_gate(jnp.asarray(x), jnp.asarray(g), irreps)
    got = x * (fo @ e1)[:, :d]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)

    vec = rng.normal(size=(5, 3)).astype(np.float32)
    rsh_full = spherical_harmonics(irreps, jnp.asarray(vec), normalize=True)
    ef = np.asarray(pack_edge_features(
        jnp.zeros((5, NB)), jnp.ones((5, 1)), jnp.asarray(vec), irreps
    ))
    np.testing.assert_allclose(
        (ef @ by)[:, :d], np.asarray(rsh_full), rtol=1e-5, atol=1e-6
    )


def _model_pair(use_pallas):
    kw = dict(node_dim=SD, node_irreps=IRREPS, embed_basis="one-hot",
              num_basis=NB, action_blocks=2, output_modes=["energy"])
    if use_pallas:
        return resolve_model(
            "xpainn", **kw, use_pallas_scatter=use_pallas,
            pallas_layout=(8, 8, 16, 16),
        )
    return resolve_model("xpainn", **kw)


def test_model_mega_matches_xla_path(rng):
    dps = []
    for _ in range(3):
        n = int(rng.integers(5, 9))
        z = rng.integers(1, 9, n).astype(np.int32)
        pos = rng.normal(size=(n, 3)) * 1.5
        from xequinet_tpu.ops.radius_graph import radius_graph_np

        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei))
    layout = {"block_nodes": 8, "chunk": 8, "pad_nodes": 16, "max_chunks": 16}
    batch = collate(dps, kernel_layout=layout)

    m_x, e_x, _ = _model_pair(False)
    params = init_params(m_x, batch)
    m_m, e_m, _ = _model_pair("mega")
    # identical parameter structure: mega checkpoints interoperate
    with pltpu.force_tpu_interpret_mode():
        p_m = init_params(m_m, batch)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p_m)

    b = {k: jnp.asarray(v) for k, v in batch.items()}
    out_x = make_apply_forward(m_x, e_x)(params, b, True, False)
    with pltpu.force_tpu_interpret_mode():
        out_m = make_apply_forward(m_m, e_m)(params, b, True, False)
    np.testing.assert_allclose(
        np.asarray(out_m[keys.TOTAL_ENERGY])[:3],
        np.asarray(out_x[keys.TOTAL_ENERGY])[:3],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_m[keys.FORCES]), np.asarray(out_x[keys.FORCES]),
        rtol=1e-3, atol=1e-4,
    )


def test_model_mega_grad_of_grad(rng):
    """Force-training path: grad of a force-dependent loss must match the
    XLA path (the custom VJP's backward is differentiable)."""
    dps = []
    for _ in range(2):
        n = 6
        z = rng.integers(1, 9, n).astype(np.int32)
        pos = rng.normal(size=(n, 3)) * 1.5
        from xequinet_tpu.ops.radius_graph import radius_graph_np

        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei))
    layout = {"block_nodes": 8, "chunk": 8, "pad_nodes": 16, "max_chunks": 16}
    batch = collate(dps, kernel_layout=layout)
    b = {k: jnp.asarray(v) for k, v in batch.items()}

    m_x, e_x, _ = _model_pair(False)
    params = init_params(m_x, batch)
    m_m, e_m, _ = _model_pair("mega")
    fx = make_apply_forward(m_x, e_x)
    fm = make_apply_forward(m_m, e_m)

    def loss(f, p):
        out = f(p, b, True, False)
        return jnp.sum(out[keys.FORCES] ** 2) + jnp.sum(
            out[keys.TOTAL_ENERGY] ** 2
        )

    gx = jax.grad(lambda p: loss(fx, p))(params)
    with pltpu.force_tpu_interpret_mode():
        gm = jax.grad(lambda p: loss(fm, p))(params)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_m = jax.tree_util.tree_leaves(gm)
    for a, c in zip(flat_x, flat_m):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-3, atol=2e-4
        )


def test_mega_kernels_asymmetric_dims(rng):
    """fwd/bwd/bwd2 with Hp=384 != Dp=256 != SDp=128.

    The default test config pads every feature group to the same 128
    lanes, so it cannot catch a mix-up in the kernels' in-kernel dim
    derivations (hp = e123.shape[0], dp = xw - hp, sdp = cols - dp) or
    in the merged [Wf|BY] / [E1|E2|MS] operand splits.  This config
    makes all three distinct."""
    IR2, NB2, SD2 = "120x0e+24x1o", 8, 16
    (src2, dst2, src_g, dst_g, cb, nc, ws, window, mx, valid,
     n_pad, total, bn, chunk) = _slot_problem(rng)
    irreps = Irreps(IR2)
    _, _, _, _, (h, hp, d, dp, sdp, n_y) = _structure_matrices(IR2, NB2, SD2)
    assert (hp, dp, sdp) == (384, 256, 128)

    x_cat = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    x_cat[:, h:hp] = 0.0
    x_cat[:, hp + d :] = 0.0
    rbf = rng.normal(size=(total, NB2)).astype(np.float32)
    fcut = rng.uniform(0.1, 1.0, size=(total, 1)).astype(np.float32)
    vec = rng.normal(size=(total, 3)).astype(np.float32)
    ef = np.asarray(pack_edge_features(
        jnp.asarray(rbf), jnp.asarray(fcut), jnp.asarray(vec), irreps
    ))
    wf_aug = np.zeros((128, hp), dtype=np.float32)
    wf_aug[: NB2 + 1, :h] = rng.normal(size=(NB2 + 1, h)).astype(np.float32)
    statics = (IR2, NB2, SD2, n_pad, bn, chunk, window, mx, "float32")

    with pltpu.force_tpu_interpret_mode():
        out = _mega_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws), *statics,
        )
    want = xla_reference(
        jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
        jnp.asarray(src_g), jnp.asarray(dst_g), jnp.asarray(valid),
        IR2, NB2, SD2, n_pad,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    from xequinet_tpu.ops.pallas_message import (
        _mega_bwd2_call, _mega_bwd_call,
    )

    g = rng.normal(size=(n_pad, sdp + dp)).astype(np.float32)
    _, vjp = jax.vjp(
        lambda x, e, w: xla_reference(
            x, e, w, jnp.asarray(src_g), jnp.asarray(dst_g),
            jnp.asarray(valid), IR2, NB2, SD2, n_pad,
        ),
        jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
    )
    want_dx, want_def, want_dwf = vjp(jnp.asarray(g))
    with pltpu.force_tpu_interpret_mode():
        dx, def_, dwf = _mega_bwd_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(g),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws), *statics,
        )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(want_dwf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(def_), np.asarray(want_def),
                               rtol=1e-4, atol=1e-4)

    # second order: vjp of the xla backward vs the bwd2 kernel
    cx = rng.normal(size=(n_pad, hp + dp)).astype(np.float32)
    cef = rng.normal(size=(total, 128)).astype(np.float32)
    cwf = rng.normal(size=(128, hp)).astype(np.float32)

    def xla_bwd(x, e, w, gg):
        _, v = jax.vjp(
            lambda xx, ee, ww: xla_reference(
                xx, ee, ww, jnp.asarray(src_g), jnp.asarray(dst_g),
                jnp.asarray(valid), IR2, NB2, SD2, n_pad,
            ),
            x, e, w,
        )
        return v(gg)

    _, vjp2 = jax.vjp(
        xla_bwd, jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
        jnp.asarray(g),
    )
    want_dx2, want_def2, want_dwf2, want_dg2 = vjp2(
        (jnp.asarray(cx), jnp.asarray(cef), jnp.asarray(cwf))
    )
    with pltpu.force_tpu_interpret_mode():
        dx2, def2, dwf2, dg2 = _mega_bwd2_call(
            jnp.asarray(x_cat), jnp.asarray(ef), jnp.asarray(wf_aug),
            jnp.asarray(g), jnp.asarray(cx), jnp.asarray(cef),
            jnp.asarray(cwf),
            jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws), *statics,
        )
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(want_dx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwf2), np.asarray(want_dwf2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dg2), np.asarray(want_dg2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(def2)[valid],
                               np.asarray(want_def2)[valid],
                               rtol=1e-4, atol=1e-4)
