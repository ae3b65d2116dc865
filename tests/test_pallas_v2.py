"""v2 one-hot MXU gather-scale-scatter: interpreter-mode correctness
against the XLA reference using realistic molecule-contiguous batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from xequinet_tpu.ops.pallas_scatter_v2 import (
    gather_scale_scatter_v2,
    prepare_v2,
    reference_impl,
)


def molecule_edges(rng, n_mols=12, lo=4, hi=12):
    """Contiguous-molecule edge structure like collate produces."""
    src_all, dst_all = [], []
    off = 0
    for _ in range(n_mols):
        k = int(rng.integers(lo, hi))
        for i in range(k):
            for j in range(k):
                if i != j and rng.random() < 0.6:
                    dst_all.append(off + i)
                    src_all.append(off + j)
        off += k
    order = np.argsort(np.asarray(dst_all), kind="stable")
    return (
        np.asarray(src_all)[order].astype(np.int32),
        np.asarray(dst_all)[order].astype(np.int32),
        off,
    )


@pytest.mark.parametrize("bn,chunk", [(8, 8), (16, 16)])
def test_v2_matches_reference(rng, bn, chunk):
    src, dst, n = molecule_edges(rng)
    d = 128
    pad_nodes = 16
    n_pad = max(((n + bn - 1) // bn) * bn, bn + 2 * pad_nodes + 8)
    x = rng.normal(size=(n_pad, d)).astype(np.float32)
    w = rng.normal(size=(len(src), d)).astype(np.float32)

    (src2, dst2, sel, chunk_base, n_chunks, win_starts, window, max_chunks
     ) = prepare_v2(src, dst, n_pad, bn, chunk, pad_nodes)
    sel_j = jnp.asarray(sel)
    w2 = jnp.where(
        (sel_j >= 0)[:, None], jnp.asarray(w)[jnp.clip(sel_j, 0, None)], 0.0
    )
    with pltpu.force_tpu_interpret_mode():
        out = gather_scale_scatter_v2(
            jnp.asarray(x), w2, jnp.asarray(src2), jnp.asarray(dst2),
            jnp.asarray(chunk_base), jnp.asarray(n_chunks),
            jnp.asarray(win_starts), n_pad, bn, chunk, window, max_chunks,
        )
    want = np.asarray(
        reference_impl(jnp.asarray(x), src, dst, jnp.asarray(w), n_pad)
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_prepare_v2_window_overflow():
    src = np.array([0, 99], dtype=np.int32)
    dst = np.array([99, 0], dtype=np.int32)
    order = np.argsort(dst)
    with pytest.raises(ValueError):
        prepare_v2(src[order], dst[order], 104, 8, 8, pad_nodes=8)


def test_fused_wrapper_grads_and_grad_of_grad(rng):
    """custom-VJP wrapper: gradient and grad-of-grad (force-training
    pattern) must match the XLA reference."""
    from xequinet_tpu.ops.pallas_scatter_v2 import fused_gather_scale_scatter

    src, dst, n = molecule_edges(rng, n_mols=6)
    bn, chunk, pad_nodes, d = 8, 8, 16, 128
    n_pad = max(((n + bn - 1) // bn) * bn, bn + 2 * pad_nodes + 8)
    x = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    w = rng.normal(size=(len(src), d)).astype(np.float32)

    (src2, dst2, sel, cb, nc, ws, window, mx) = prepare_v2(
        src, dst, n_pad, bn, chunk, pad_nodes
    )
    sel_j = jnp.asarray(sel)
    w2 = jnp.where(
        (sel_j >= 0)[:, None], jnp.asarray(w)[jnp.clip(sel_j, 0, None)], 0.0
    )
    src_g = jnp.where(sel_j >= 0, jnp.asarray(src)[jnp.clip(sel_j, 0, None)], 0)
    dst_g = jnp.where(
        sel_j >= 0, jnp.asarray(dst)[jnp.clip(sel_j, 0, None)], n_pad - 1
    )
    meta = (
        jnp.asarray(src2), jnp.asarray(dst2), dst_g,
        jnp.asarray(cb), jnp.asarray(nc), jnp.asarray(ws),
    )

    def f_kernel(x, w2):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = fused_gather_scale_scatter(
                x, w2, src_g, meta, n_pad, bn, chunk, window, mx
            )
        return jnp.sum(jnp.sin(out))

    def f_ref(x, w2):
        out = jax.ops.segment_sum(
            jnp.take(x, src_g, axis=0) * w2, dst_g, num_segments=n_pad
        )
        return jnp.sum(jnp.sin(out))

    gx_k, gw_k = jax.grad(f_kernel, argnums=(0, 1))(x, w2)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w2)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), rtol=1e-4, atol=1e-4)

    # grad-of-grad (force-training pattern)
    def gg(f):
        def loss(x, w2):
            gx = jax.grad(f, argnums=0)(x, w2)
            return jnp.sum(gx**2)

        return jax.grad(loss, argnums=(0, 1))(x, w2)

    ggx_k, ggw_k = gg(f_kernel)
    ggx_r, ggw_r = gg(f_ref)
    np.testing.assert_allclose(np.asarray(ggx_k), np.asarray(ggx_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ggw_k), np.asarray(ggw_r), rtol=1e-3, atol=1e-3)


def test_model_with_kernel_matches_xla_path(rng):
    """Full XPaiNN forward+forces with use_pallas_scatter must match the
    XLA path on a kernel-layout batch (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from xequinet_tpu import keys
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import (
        init_params,
        make_apply_forward,
        resolve_model,
    )
    from xequinet_tpu.ops.radius_graph import radius_graph_np

    dps = []
    for _ in range(3):
        n = int(rng.integers(5, 9))
        z = rng.integers(1, 9, n).astype(np.int32)
        pos = rng.normal(size=(n, 3)) * 1.5
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei))

    layout = {"block_nodes": 8, "chunk": 8, "pad_nodes": 16, "max_chunks": 16}
    batch = collate(dps, kernel_layout=layout)
    assert keys.K_SRC2 in batch
    kw = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e", embed_basis="one-hot",
              num_basis=8, action_blocks=2, output_modes=["energy"])
    m_x, e_x, _ = resolve_model("xpainn", **kw)
    params = init_params(m_x, batch)
    m_k, e_k, _ = resolve_model(
        "xpainn", **kw, use_pallas_scatter=True,
        pallas_layout=(8, 8, 16, 16),
    )
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    out_x = make_apply_forward(m_x, e_x)(params, b, True, False)
    with pltpu.force_tpu_interpret_mode():
        out_k = make_apply_forward(m_k, e_k)(params, b, True, False)
    np.testing.assert_allclose(
        np.asarray(out_k[keys.TOTAL_ENERGY])[:3],
        np.asarray(out_x[keys.TOTAL_ENERGY])[:3],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_k[keys.FORCES]), np.asarray(out_x[keys.FORCES]),
        rtol=1e-3, atol=1e-4,
    )
