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
