"""XMatNet: end-to-end quantum-chemistry matrix prediction.

QHNet-style operator learning assembled from the matlayer blocks
(reference /root/reference/xequinet/nn/matlayer.py ships the blocks but
never registers a model; this family goes beyond the reference): an
XPaiNN backbone produces equivariant node features; ``SelfLayer`` +
``Expansion`` emit the diagonal (onsite) [D, D] blocks per atom and
``PairLayer`` + ``Expansion`` the off-diagonal (offsite) blocks per
edge, where D is the dimension of the target AO basis
(``utils/mat_toolkit.MatToolkit.get_basis_irreps``).  The full matrix is
assembled host-side with ``MatToolkit.assemble_blocks``; training
regresses the padded per-block targets from
``MatToolkit.get_padded_blocks`` under NODE_MASK / EDGE_MASK
(keys.NODE_MAT_BLOCKS / keys.EDGE_MAT_BLOCKS).

Everything is static-shape: blocks are computed for every padded slot
and masked, so one compiled program serves a whole padded bucket.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from .. import keys
from ..ops.irreps import Irreps
from .matlayer import Expansion, PairLayer, SelfLayer
from .o3layer import O3Linear

Array = jnp.ndarray
DataDict = Dict[str, Array]


class MatOut(nn.Module):
    """Matrix output head: node/edge features -> AO-basis matrix blocks.

    ``n_mat_layers`` stacked Self/Pair layers refine the onsite/offsite
    features (residually, reference matlayer.py fii_in/fij_in hooks)
    before the wigner-3j Expansion onto ``basis_irreps x basis_irreps``.
    The diagonal blocks are symmetrized (operator matrices are
    Hermitian; the offsite ij/ji blocks are learned independently, as in
    QHNet, and symmetrized at assembly if desired).
    """

    node_irreps: str
    hidden_irreps: str
    basis_irreps: str
    node_dim: int
    num_basis: int = 20
    n_mat_layers: int = 2
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        node_irreps = Irreps(self.node_irreps)
        hidden = Irreps(self.hidden_irreps)
        basis = Irreps(self.basis_irreps)
        # the QHNet uuu self-TP needs UNIFORM multiplicities: project the
        # backbone features (decreasing muls) onto mat_irreps first
        muls = {mi.mul for mi in hidden}
        if len(muls) != 1:
            raise ValueError(
                f"hidden_irreps must have uniform multiplicities for the "
                f"uuu matrix TPs (QHNet contract), got {hidden}"
            )

        x = data[keys.NODE_EQUIVARIANT]
        x = O3Linear(node_irreps, hidden, biases=True)(x)
        node_irreps = hidden
        embed = data[keys.NODE_INVARIANT]
        rbf = data[keys.RADIAL_BASIS_FUNCTION] * data[
            keys.ENVELOPE_FUNCTION
        ]
        edge_index = data[keys.EDGE_INDEX]
        edge_mask = data[keys.EDGE_MASK]
        node_mask = data[keys.NODE_MASK]

        fii = None
        fij = None
        for _ in range(self.n_mat_layers):
            fii = SelfLayer(
                irreps_in=node_irreps, irreps_hidden=hidden,
                activation=self.activation,
            )(x, fii)
            fij = PairLayer(
                irreps_in=node_irreps, irreps_hidden=hidden,
                edge_attr_dim=self.num_basis, activation=self.activation,
            )(x, rbf, edge_index, fij)

        diag = Expansion(
            irreps_block=hidden, irreps_out=basis,
            node_dim=self.node_dim, activation=self.activation,
        )(fii, embed)
        diag = 0.5 * (diag + jnp.swapaxes(diag, -1, -2))

        pair_embed = 0.5 * (
            jnp.take(embed, edge_index[keys.CENTER_IDX], axis=0)
            + jnp.take(embed, edge_index[keys.NEIGHBOR_IDX], axis=0)
        )
        offdiag = Expansion(
            irreps_block=hidden, irreps_out=basis,
            node_dim=self.node_dim, activation=self.activation,
            pair_out=True,
        )(fij, pair_embed)

        data[keys.NODE_MAT_BLOCKS] = jnp.where(
            node_mask[:, None, None], diag, 0.0
        )
        data[keys.EDGE_MAT_BLOCKS] = jnp.where(
            edge_mask[:, None, None], offdiag, 0.0
        )
        return data


def build_xmatnet(**kwargs: Any):
    """Factory for the matrix-learning family.

    Required kwargs: ``target_basis`` ({element: [l, ...]} shell spec or
    a PySCF basis name) and ``elements`` (symbols the model must cover) —
    they determine the output block dimension via MatToolkit.
    """
    from ..utils.mat_toolkit import MatToolkit
    from .model import BlockStack, build_xpainn  # deferred: cycle

    target_basis = kwargs.get("target_basis")
    elements = kwargs.get("elements")
    if target_basis is None or elements is None:
        raise ValueError(
            "xmatnet needs target_basis ({element: [l,...]} or a PySCF "
            "basis name) and elements=[symbols]"
        )
    toolkit = MatToolkit(target_basis, elements)
    basis_irreps = str(toolkit.get_basis_irreps())

    # backbone without output heads
    backbone, _, cutoff = build_xpainn(
        **{**kwargs, "output_modes": []}
    )
    blocks = list(backbone.blocks)
    blocks.append(
        MatOut(
            node_irreps=str(kwargs.get("node_irreps", "128x0e+64x1o+32x2e")),
            hidden_irreps=str(
                kwargs.get("hidden_irreps", "32x0e+32x1o+32x2e")
            ),
            basis_irreps=basis_irreps,
            node_dim=int(kwargs.get("node_dim", 128)),
            num_basis=int(kwargs.get("num_basis", 20)),
            n_mat_layers=int(kwargs.get("n_mat_layers", 2)),
            activation=str(kwargs.get("activation", "silu")),
        )
    )
    return BlockStack(blocks=tuple(blocks)), [
        keys.NODE_MAT_BLOCKS, keys.EDGE_MAT_BLOCKS,
    ], cutoff
