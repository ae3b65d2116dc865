"""XPaiNN blocks: embedding, message, update.

TPU-native re-design of /root/reference/xequinet/nn/xpainn.py.  Each block
is a pure flax module mapping the blackboard dict -> dict (SURVEY.md §1);
neighbor gathers are ``jnp.take`` and aggregation is a masked
``segment_sum`` with static ``num_segments`` (replacing torch
index_select/index_add at reference nn/xpainn.py:142-159).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .. import keys
from ..ops.irreps import Irreps
from ..ops.o3ops import equivariant_dot, invariant, scalar_gate
from ..ops.scatter import segment_sum
from ..ops.spherical import spherical_harmonics
from .basic import AtomEmbedding, resolve_activation
from .o3layer import EquivariantLayerNorm, O3Linear
from .rbf import resolve_cutoff, resolve_rbf

Array = jnp.ndarray
DataDict = Dict[str, Array]


class XEmbedding(nn.Module):
    """Node embedding + edge basis (reference nn/xpainn.py:14-83).

    Writes NODE_INVARIANT, RADIAL_BASIS_FUNCTION, ENVELOPE_FUNCTION,
    SPHERICAL_HARMONICS ([x,y,z] -> [y,z,x] permuted into the irrep basis)
    and zero NODE_EQUIVARIANT.
    """

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    embed_basis: str = "gfn2-xtb"
    aux_basis: str = "aux56"
    num_basis: int = 20
    rbf_kernel: str = "bessel"
    cutoff: float = 5.0
    cutoff_fn: str = "cosine"
    # mega-kernel mode: additionally pack [rbf*fcut | fcut | Y_unique]
    # into one [E, 128] stream shared by every message block
    # (ops/pallas_message.py)
    pack_edge_features: bool = False

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        irreps = Irreps(self.node_irreps)
        atomic_numbers = data[keys.ATOMIC_NUMBERS]
        vectors = data[keys.EDGE_VECTOR]
        distances = data[keys.EDGE_LENGTH][..., None]

        embed_table = None
        if self.embed_basis != "one-hot":
            from ..utils.qc import get_embedding_table

            embed_table = get_embedding_table(self.embed_basis, self.aux_basis)
        node_invariant = AtomEmbedding(
            node_dim=self.node_dim, embed_table=embed_table
        )(atomic_numbers)
        data[keys.NODE_INVARIANT] = node_invariant

        rbf = resolve_rbf(self.rbf_kernel, self.num_basis, self.cutoff)(distances)
        fcut = resolve_cutoff(self.cutoff_fn, self.cutoff)(distances)
        data[keys.RADIAL_BASIS_FUNCTION] = rbf
        data[keys.ENVELOPE_FUNCTION] = fcut

        # [x, y, z] -> [y, z, x]: into the irrep basis, as the reference
        # does at nn/xpainn.py:70-74
        vec_irrep = vectors[..., jnp.asarray([1, 2, 0])]
        rsh = spherical_harmonics(irreps, vec_irrep, normalize=True)
        data[keys.SPHERICAL_HARMONICS] = rsh

        data[keys.NODE_EQUIVARIANT] = jnp.zeros(
            (node_invariant.shape[0], irreps.dim), dtype=node_invariant.dtype
        )
        if self.pack_edge_features:
            from ..ops.pallas_message import pack_edge_features

            data[keys.K_EDGE_FEAT] = pack_edge_features(
                rbf, fcut, vec_irrep, irreps
            )
        return data


class XPainnMessage(nn.Module):
    """Message block (reference nn/xpainn.py:86-161).

    ``compute_dtype="bfloat16"`` runs the per-edge pipeline (gather, gates,
    message assembly, segment accumulation) in bf16 — the block is HBM-
    bandwidth-bound (PERF.md), so halving the edge-array traffic is the
    dominant lever.  Parameters, LayerNorm and the residual state stay
    f32; accumulation error is ~0.1-1% relative (validated in tests).
    """

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    num_basis: int = 20
    activation: str = "silu"
    layer_norm: bool = True
    compute_dtype: str = "float32"
    # Pallas routing (requires collate(kernel_layout=...)):
    #   False  — pure XLA path
    #   True   — v2: equivariant-state gather/scatter via the one-hot MXU
    #            kernel (ops/pallas_scatter_v2)
    #   "mega" — the whole edge pipeline (filter, gather, gates, SH
    #            gating, scatter) in one kernel (ops/pallas_message),
    #            first-order backward kernelized too
    #   "mega-xb" — mega forward kernel, XLA backward
    use_pallas: object = False
    pallas_layout: tuple = (256, 1024, 32, 8)  # (BN, chunk, pad_nodes, max_chunks)

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        irreps = Irreps(self.node_irreps)
        num_irreps = irreps.num_irreps
        hidden_dim = self.node_dim + num_irreps * 2
        act = resolve_activation(self.activation)
        cdtype = jnp.dtype(self.compute_dtype)

        # periodic ghost rows: refresh from the owning real atom's current
        # state before any src gather (update blocks only touch real rows
        # meaningfully; ghost rows go stale between message blocks).  The
        # map is the identity on real rows, so this is a no-op for them.
        if keys.GHOST_MAP in data:
            gm = data[keys.GHOST_MAP]
            data[keys.NODE_INVARIANT] = jnp.take(
                data[keys.NODE_INVARIANT], gm, axis=0
            )
            data[keys.NODE_EQUIVARIANT] = jnp.take(
                data[keys.NODE_EQUIVARIANT], gm, axis=0
            )

        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        if self.layer_norm:
            node_scalar = nn.LayerNorm(epsilon=1e-5)(node_scalar)
            node_equi = EquivariantLayerNorm(irreps=irreps)(node_equi)
        rbf = data[keys.RADIAL_BASIS_FUNCTION]
        fcut = data[keys.ENVELOPE_FUNCTION]
        edge_index = data[keys.EDGE_INDEX]
        center_idx = edge_index[keys.CENTER_IDX]
        neighbor_idx = edge_index[keys.NEIGHBOR_IDX]
        edge_mask = data[keys.EDGE_MASK]
        n_nodes = node_scalar.shape[0]

        h = nn.Dense(self.node_dim, dtype=cdtype)(node_scalar)
        h = act(h)
        scalar_out = nn.Dense(hidden_dim, dtype=cdtype)(h)
        filter_dense = nn.Dense(hidden_dim, dtype=cdtype)
        node_equi = node_equi.astype(cdtype)

        use_mega = (
            self.use_pallas in ("mega", "mega-xb")
            and keys.K_SRC2 in data
            and keys.K_EDGE_FEAT in data
        )
        if use_mega:
            return self._mega_path(
                data, irreps, scalar_out, node_equi, filter_dense,
                center_idx, neighbor_idx, n_nodes, cdtype,
            )
        rsh = data[keys.SPHERICAL_HARMONICS].astype(cdtype)
        filter_weight = filter_dense(rbf) * fcut.astype(cdtype)

        use_kernel = (
            self.use_pallas is True or self.use_pallas == "v2"
        ) and keys.K_SRC2 in data
        # one gather and one scatter per block: neighbor scalars and
        # neighbor equivariants ride the same gather, and the scalar +
        # equivariant messages ride the same segment sum — halves the
        # number of large sparse ops the TPU executes per layer.
        # (with the pallas kernel, the equivariant gather happens inside
        # the kernel, so only the scalars are gathered here)
        if use_kernel:
            gathered = jnp.take(scalar_out, neighbor_idx, axis=0)
            filter_out = gathered * filter_weight
            neighbor_equi = None
        else:
            src_cat = jnp.concatenate([scalar_out, node_equi], axis=-1)
            gathered = jnp.take(src_cat, neighbor_idx, axis=0)
            filter_out = gathered[..., :hidden_dim] * filter_weight
            neighbor_equi = gathered[..., hidden_dim:]

        gate_state_equi = filter_out[..., :num_irreps]
        gate_edge_equi = filter_out[..., num_irreps : 2 * num_irreps]
        message_scalar = filter_out[..., 2 * num_irreps :]

        if use_kernel:
            # equivariant-state message through the one-hot MXU kernel:
            # out[c] = sum_e node_equi[src[e]] * expand(gate_state[e]);
            # the gate expansion and the remaining (scalar + rsh) streams
            # stay on the XLA path
            from ..ops.pallas_scatter_v2 import fused_gather_scale_scatter

            bn_, chunk_, pad_nodes_, max_chunks_ = self.pallas_layout
            window_ = bn_ + 2 * ((pad_nodes_ + 7) // 8) * 8
            dim = irreps.dim
            d_pad = ((dim + 127) // 128) * 128
            ones = jnp.ones((1, dim), dtype=gate_state_equi.dtype)
            g1exp = scalar_gate(
                jnp.broadcast_to(ones, (gate_state_equi.shape[0], dim)),
                gate_state_equi,
                irreps,
            )
            g1exp = jnp.where(edge_mask[:, None], g1exp, 0.0)
            # the (post-LayerNorm) equivariant state the XLA path gathers
            x_eq = node_equi.astype(jnp.float32)
            if d_pad != dim:
                x_eq = jnp.pad(x_eq, ((0, 0), (0, d_pad - dim)))
                g1exp = jnp.pad(g1exp, ((0, 0), (0, d_pad - dim)))
            meta = (
                data[keys.K_SRC2],
                data[keys.K_DST2],
                center_idx,
                data[keys.K_CHUNK_BASE],
                data[keys.K_NCHUNKS],
                data[keys.K_WSTARTS],
            )
            equi_state_agg = fused_gather_scale_scatter(
                x_eq, g1exp.astype(jnp.float32), neighbor_idx, meta,
                n_nodes, bn_, chunk_, window_, max_chunks_,
            )[:, :dim]
            message_equi = scalar_gate(rsh, gate_edge_equi, irreps)
        else:
            message_equi = scalar_gate(
                neighbor_equi, gate_state_equi, irreps
            ) + scalar_gate(rsh, gate_edge_equi, irreps)

        from ..ops.scatter import _HALO_SPEC, _halo_refresh

        halo_spec = _HALO_SPEC.get()
        message_cat = jnp.concatenate([message_scalar, message_equi], axis=-1)
        # under halo + v2 kernel the refresh must come AFTER the kernel's
        # equivariant aggregate is folded in (its halo rows are zero too),
        # so defer it to one combined refresh below
        agg = segment_sum(
            message_cat, center_idx, n_nodes, edge_mask,
            indices_are_sorted=True,
            scope="nodes" if (use_kernel and halo_spec is not None) else "edges",
        )
        # named for remat policies: saving the aggregation output lets
        # rematerialization skip recomputing the gather/scatter pipeline
        agg = checkpoint_name(agg, "edge_agg")
        agg = agg.astype(data[keys.NODE_INVARIANT].dtype)
        if use_kernel:
            agg = agg.at[..., self.node_dim :].add(
                equi_state_agg.astype(agg.dtype)
            )
            if halo_spec is not None:
                agg = _halo_refresh(agg, *halo_spec)
        data[keys.NODE_INVARIANT] = data[keys.NODE_INVARIANT] + agg[..., : self.node_dim]
        data[keys.NODE_EQUIVARIANT] = (
            data[keys.NODE_EQUIVARIANT] + agg[..., self.node_dim :]
        )
        return data

    def _mega_path(
        self, data, irreps, scalar_out, node_equi, filter_dense,
        center_idx, neighbor_idx, n_nodes, cdtype,
    ) -> DataDict:
        """Whole-edge-pipeline mega-kernel route (ops/pallas_message).

        The filter Dense's parameters are extracted by probing the module
        with an identity/zero input (keeps the flax parameter structure
        identical to the XLA path, so checkpoints interoperate)."""
        from ..ops.pallas_message import _pad128, fused_message

        hidden_dim = self.node_dim + irreps.num_irreps * 2
        dim = irreps.dim
        hp, dp, sdp = _pad128(hidden_dim), _pad128(dim), _pad128(self.node_dim)

        # W rows + bias row -> [num_basis + 1, hidden]; ef's rbf columns
        # already carry the fcut factor and its fcut column carries the
        # bias (pallas_message module docstring)
        probe = filter_dense(
            jnp.concatenate(
                [jnp.eye(self.num_basis, dtype=cdtype),
                 jnp.zeros((1, self.num_basis), dtype=cdtype)]
            )
        )
        bias = probe[-1]
        wf_aug = jnp.concatenate([probe[:-1] - bias[None, :], bias[None, :]])
        from ..ops.pallas_message import F_PACK

        wf_aug = jnp.pad(
            wf_aug.astype(jnp.float32),
            ((0, F_PACK - wf_aug.shape[0]), (0, hp - hidden_dim)),
        )

        x_cat = jnp.concatenate(
            [
                jnp.pad(
                    scalar_out.astype(jnp.float32),
                    ((0, 0), (0, hp - hidden_dim)),
                ),
                jnp.pad(
                    node_equi.astype(jnp.float32), ((0, 0), (0, dp - dim))
                ),
            ],
            axis=-1,
        )

        bn_, chunk_, pad_nodes_, max_chunks_ = self.pallas_layout
        window_ = bn_ + 2 * ((pad_nodes_ + 7) // 8) * 8
        slot_meta = (
            data[keys.K_SRC2],
            data[keys.K_DST2],
            neighbor_idx,
            center_idx,
            data[keys.K_CHUNK_BASE],
            data[keys.K_NCHUNKS],
            data[keys.K_WSTARTS],
        )
        mm = "bfloat16" if cdtype == jnp.bfloat16 else "float32"
        agg_full = fused_message(
            x_cat, data[keys.K_EDGE_FEAT], wf_aug, slot_meta,
            data[keys.EDGE_MASK],
            str(irreps), self.num_basis, self.node_dim,
            n_nodes, bn_, chunk_, window_, max_chunks_, mm,
            self.use_pallas == "mega",  # kernel_bwd
        )
        agg = jnp.concatenate(
            [agg_full[:, : self.node_dim], agg_full[:, sdp : sdp + dim]],
            axis=-1,
        )
        # halo decomposition (ops.scatter.halo_parallel): the kernel's
        # edges all target owned rows, so the window's halo rows come out
        # zero — refresh them from the owning shards by boundary ppermute,
        # exactly as the XLA path's segment_sum(scope="edges") does.  The
        # refresh sits OUTSIDE the kernel's custom VJP, so force training
        # routes halo cotangents back through the ppermute transpose.
        from ..ops.scatter import _HALO_SPEC, _halo_refresh

        halo_spec = _HALO_SPEC.get()
        if halo_spec is not None:
            agg = _halo_refresh(agg, *halo_spec)
        agg = checkpoint_name(agg, "edge_agg")
        agg = agg.astype(data[keys.NODE_INVARIANT].dtype)
        data[keys.NODE_INVARIANT] = (
            data[keys.NODE_INVARIANT] + agg[..., : self.node_dim]
        )
        data[keys.NODE_EQUIVARIANT] = (
            data[keys.NODE_EQUIVARIANT] + agg[..., self.node_dim :]
        )
        return data


class XPainnUpdate(nn.Module):
    """Update block (reference nn/xpainn.py:164-231)."""

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    activation: str = "silu"
    layer_norm: bool = True
    # bf16 phase 2: equivariant linears + MLP on the MXU in this dtype
    # (f32 params/accumulation/residual; accuracy tracked in PERF.md)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        irreps = Irreps(self.node_irreps)
        num_irreps = irreps.num_irreps
        act = resolve_activation(self.activation)
        cdtype = jnp.dtype(self.compute_dtype)
        mix_dtype = self.compute_dtype if cdtype != jnp.float32 else None

        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        if self.layer_norm:
            node_scalar = nn.LayerNorm(epsilon=1e-5)(node_scalar)
            node_equi = EquivariantLayerNorm(irreps=irreps)(node_equi)

        # U and V share the input: build both block matrices and run ONE
        # [N, dim] @ [dim, 2*dim] matmul (half the matmul boundaries and
        # one less full read of node_equi; params identical to two
        # separate O3Linear applications, so checkpoints interoperate)
        w_u, b_u = O3Linear(
            irreps, irreps, biases=True, compute_dtype=mix_dtype
        )(node_equi, return_block=True)
        w_v, b_v = O3Linear(
            irreps, irreps, biases=True, compute_dtype=mix_dtype
        )(node_equi, return_block=True)
        w_uv = jnp.concatenate([w_u, w_v], axis=-1)
        if cdtype != jnp.float32:
            uv = jnp.dot(
                node_equi.astype(cdtype), w_uv.astype(cdtype),
                preferred_element_type=jnp.float32,
            )
        else:
            from jax import lax

            uv = jnp.dot(node_equi, w_uv, precision=lax.Precision.HIGHEST)
        dim = irreps.dim
        u_equi = uv[..., :dim] + (0.0 if b_u is None else b_u)
        v_equi = uv[..., dim:] + (0.0 if b_v is None else b_v)

        v_scalar = invariant(v_equi, irreps)
        mlp_in = jnp.concatenate([node_scalar, v_scalar], axis=-1).astype(cdtype)
        h = nn.Dense(self.node_dim, dtype=cdtype)(mlp_in)
        h = act(h)
        mlp_out = nn.Dense(self.node_dim * 2 + num_irreps, dtype=cdtype)(h)
        mlp_out = mlp_out.astype(jnp.float32)

        a_vv = mlp_out[..., :num_irreps]
        a_sv = mlp_out[..., num_irreps : num_irreps + self.node_dim]
        a_ss = mlp_out[..., num_irreps + self.node_dim :]

        d_equi = scalar_gate(u_equi, a_vv, irreps)
        inner = equivariant_dot(u_equi, v_equi, irreps)
        inner = nn.Dense(self.node_dim, use_bias=False)(inner)
        d_scalar = a_sv * inner + a_ss

        data[keys.NODE_INVARIANT] = data[keys.NODE_INVARIANT] + d_scalar
        data[keys.NODE_EQUIVARIANT] = data[keys.NODE_EQUIVARIANT] + d_equi
        return data
