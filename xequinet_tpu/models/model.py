"""Model assembly and factory: XPaiNN and friends as ordered block stacks.

TPU-native counterpart of /root/reference/xequinet/nn/model.py.  A model
is a flax module holding an ordered list of dict->dict blocks (the
blackboard design of SURVEY.md §1); the full forward with autodiff
properties is produced by :func:`build_model` +
``models.properties.make_forward``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .. import keys
from ..ops.irreps import Irreps
from .electronic import ChargeEmbedding, SpinEmbedding
from .output import OUTPUT_EXTRA_PROPERTIES, resolve_output
from .xpainn import XEmbedding, XPainnMessage, XPainnUpdate

Array = jnp.ndarray
DataDict = Dict[str, Array]


class BlockStack(nn.Module):
    """Threads the data dict through an ordered sequence of blocks
    (reference nn/model.py:18-46 BaseModel.forward middle section)."""

    blocks: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        for block in self.blocks:
            data = block(data)
        return data


def _as_list(modes: Union[None, str, Sequence[str]]) -> List[str]:
    if modes is None:
        return ["energy"]
    if isinstance(modes, str):
        return [modes]
    return list(modes)


def build_xpainn(**kwargs: Any) -> Tuple[BlockStack, List[str], float]:
    """XPaiNN: XEmbedding -> [Charge/SpinEmbedding] -> N x (Message, Update)
    -> output heads (reference nn/model.py:49-123).

    Returns (module, extra_properties, cutoff_radius).
    """
    node_dim: int = kwargs.get("node_dim", 128)
    node_irreps = Irreps(kwargs.get("node_irreps", "128x0e + 64x1o + 32x2e"))
    embed_basis: str = kwargs.get("embed_basis", "gfn2-xtb")
    aux_basis: str = kwargs.get("aux_basis", "aux56")
    num_basis: int = kwargs.get("num_basis", 20)
    rbf_kernel: str = kwargs.get("rbf_kernel", "bessel")
    cutoff: float = kwargs.get("cutoff", 5.0)
    cutoff_fn: str = kwargs.get("cutoff_fn", "cosine")
    action_blocks: int = kwargs.get("action_blocks", 3)
    activation: str = kwargs.get("activation", "silu")
    layer_norm: bool = kwargs.get("layer_norm", True)
    charge_embed: bool = kwargs.get("charge_embed", False)
    spin_embed: bool = kwargs.get("spin_embed", False)
    output_modes = _as_list(kwargs.get("output_modes", ["energy"]))
    # rematerialization: recompute block activations in the backward pass
    # instead of storing them — jax.checkpoint per action block, trading
    # FLOPs for HBM (enables much larger batches / supercells).
    # remat_policy "save_edge_agg" keeps each block's edge-aggregation
    # output resident so the backward pass skips recomputing the sparse
    # gather/scatter pipeline (cheap elementwise work is still remat'd).
    remat: bool = kwargs.get("remat", False)
    remat_policy: str = kwargs.get("remat_policy", "full")
    if remat:
        import jax as _jax

        policy = (
            _jax.checkpoint_policies.save_only_these_names("edge_agg")
            if remat_policy == "save_edge_agg"
            else None
        )
        MessageCls = nn.remat(XPainnMessage, policy=policy)
        UpdateCls = nn.remat(XPainnUpdate, policy=policy)
    else:
        MessageCls = XPainnMessage
        UpdateCls = XPainnUpdate

    compute_dtype: str = kwargs.get("compute_dtype", "float32")
    # bf16 phase 2 (opt-in): update-block equivariant linears + MLP in
    # this dtype as well (accuracy tracked in PERF.md)
    update_compute_dtype: str = kwargs.get("update_compute_dtype", "float32")
    # use_pallas_scatter: False | True ("v2" scatter kernel) | "mega"
    # (whole-edge-pipeline kernel, ops/pallas_message)
    use_pallas = kwargs.get("use_pallas_scatter", False)
    pallas_layout = tuple(kwargs.get("pallas_layout", (256, 1024, 32, 8)))
    blocks: List[nn.Module] = [
        XEmbedding(
            node_dim=node_dim,
            node_irreps=node_irreps,
            embed_basis=embed_basis,
            aux_basis=aux_basis,
            num_basis=num_basis,
            rbf_kernel=rbf_kernel,
            cutoff=cutoff,
            cutoff_fn=cutoff_fn,
            pack_edge_features=(use_pallas in ("mega", "mega-xb")),
        )
    ]
    if charge_embed:
        blocks.append(ChargeEmbedding(node_dim=node_dim, activation=activation))
    if spin_embed:
        blocks.append(SpinEmbedding(node_dim=node_dim, activation=activation))
    for _ in range(action_blocks):
        blocks.append(
            MessageCls(
                node_dim=node_dim,
                node_irreps=node_irreps,
                num_basis=num_basis,
                activation=activation,
                layer_norm=layer_norm,
                compute_dtype=compute_dtype,
                use_pallas=use_pallas,
                pallas_layout=pallas_layout,
            )
        )
        blocks.append(
            UpdateCls(
                node_dim=node_dim,
                node_irreps=node_irreps,
                activation=activation,
                layer_norm=layer_norm,
                compute_dtype=update_compute_dtype,
            )
        )
    extra_properties: List[str] = []
    for mode in output_modes:
        head_kwargs = dict(kwargs)
        head_kwargs.setdefault("node_irreps", node_irreps)
        blocks.append(resolve_output(mode, **head_kwargs))
        extra_properties.extend(OUTPUT_EXTRA_PROPERTIES[mode])

    return BlockStack(blocks=tuple(blocks)), extra_properties, cutoff


def build_painn(**kwargs: Any) -> Tuple[BlockStack, List[str], float]:
    """PaiNN baseline (reference nn/model.py:261-307)."""
    from .painn import PainnEmbedding, PainnMessage, PainnUpdate

    node_dim: int = kwargs.get("node_dim", 128)
    embed_basis: str = kwargs.get("embed_basis", "gfn2-xtb")
    aux_basis: str = kwargs.get("aux_basis", "aux56")
    num_basis: int = kwargs.get("num_basis", 20)
    rbf_kernel: str = kwargs.get("rbf_kernel", "bessel")
    cutoff: float = kwargs.get("cutoff", 5.0)
    cutoff_fn: str = kwargs.get("cutoff_fn", "cosine")
    action_blocks: int = kwargs.get("action_blocks", 3)
    activation: str = kwargs.get("activation", "silu")
    output_modes = _as_list(kwargs.get("output_modes", ["energy"]))

    blocks: List[nn.Module] = [
        PainnEmbedding(
            node_dim=node_dim,
            num_basis=num_basis,
            embed_basis=embed_basis,
            aux_basis=aux_basis,
            rbf_kernel=rbf_kernel,
            cutoff=cutoff,
            cutoff_fn=cutoff_fn,
        )
    ]
    for _ in range(action_blocks):
        blocks.append(
            PainnMessage(
                node_dim=node_dim, num_basis=num_basis, activation=activation
            )
        )
        blocks.append(PainnUpdate(node_dim=node_dim, activation=activation))
    extra_properties: List[str] = []
    for mode in output_modes:
        blocks.append(resolve_output(mode, **kwargs))
        extra_properties.extend(OUTPUT_EXTRA_PROPERTIES[mode])
    return BlockStack(blocks=tuple(blocks)), extra_properties, cutoff


def build_xpainn_ewald(**kwargs: Any) -> Tuple[BlockStack, List[str], float]:
    """XPaiNN + Ewald long-range blocks (reference nn/model.py:125-176)."""
    from .ewald import EwaldBlock, EwaldInitialNonPBC, EwaldInitialPBC

    stack, extra_properties, cutoff = build_xpainn(**kwargs)
    blocks = list(stack.blocks)
    # separate the short-range output heads: the reference appends ewald
    # blocks AFTER the xpainn heads, accumulating atomic energies
    node_dim: int = kwargs.get("node_dim", 128)
    activation: str = kwargs.get("activation", "silu")
    layer_norm: bool = kwargs.get("layer_norm", True)
    use_pbc: bool = kwargs.get("use_pbc", True)
    projection_dim: int = kwargs.get("projection_dim", 8)
    ewald_blocks: int = kwargs.get("ewald_blocks", 1)
    ewald_output_modes = _as_list(kwargs.get("ewald_output_mode", ["energy"]))

    if use_pbc:
        num_k_points = tuple(kwargs.get("num_k_points", [3, 3, 3]))
        blocks.append(
            EwaldInitialPBC(
                num_k_points=num_k_points, projection_dim=projection_dim
            )
        )
    else:
        blocks.append(
            EwaldInitialNonPBC(
                k_cutoff=kwargs.get("k_cutoff", 0.4),
                delta_k=kwargs.get("delta_k", 0.2),
                num_k_basis=kwargs.get("num_k_basis", 20),
                k_offset=kwargs.get("k_offset", None),
                projection_dim=projection_dim,
            )
        )
    for _ in range(ewald_blocks):
        blocks.append(
            EwaldBlock(
                node_dim=node_dim,
                projection_dim=projection_dim,
                activation=activation,
                layer_norm=layer_norm,
            )
        )
    for mode in ewald_output_modes:
        head_kwargs = dict(kwargs)
        head_kwargs.setdefault("node_irreps", kwargs.get("node_irreps", "128x0e + 64x1o + 32x2e"))
        blocks.append(resolve_output(mode, **head_kwargs))
        extra_properties.extend(OUTPUT_EXTRA_PROPERTIES[mode])
    return BlockStack(blocks=tuple(blocks)), extra_properties, cutoff


def build_so3krates(**kwargs: Any) -> Tuple[BlockStack, List[str], float]:
    """SO3krates (reference nn/model.py:179-258; registered here unlike the
    reference factory)."""
    from .so3krates import EuclideanAttention, InteractionBlock

    node_dim: int = kwargs.get("node_dim", 120)
    node_channel: int = kwargs.get("node_channel", 32)
    l_max: int = kwargs.get("max_l", 3)
    node_irreps = Irreps([(node_channel, (l, (-1) ** l)) for l in range(l_max + 1)])
    num_heads: int = kwargs.get("num_heads", 4)
    embed_basis: str = kwargs.get("embed_basis", "gfn2-xtb")
    aux_basis: str = kwargs.get("aux_basis", "aux56")
    num_basis: int = kwargs.get("num_basis", 20)
    rbf_kernel: str = kwargs.get("rbf_kernel", "bessel")
    cutoff: float = kwargs.get("cutoff", 5.0)
    cutoff_fn: str = kwargs.get("cutoff_fn", "cosine")
    action_blocks: int = kwargs.get("action_blocks", 3)
    activation: str = kwargs.get("activation", "silu")
    layer_norm: bool = kwargs.get("layer_norm", False)
    charge_embed: bool = kwargs.get("charge_embed", False)
    spin_embed: bool = kwargs.get("spin_embed", False)
    output_modes = _as_list(kwargs.get("output_modes", ["energy"]))

    blocks: List[nn.Module] = [
        XEmbedding(
            node_dim=node_dim,
            node_irreps=node_irreps,
            embed_basis=embed_basis,
            aux_basis=aux_basis,
            num_basis=num_basis,
            rbf_kernel=rbf_kernel,
            cutoff=cutoff,
            cutoff_fn=cutoff_fn,
        )
    ]
    if charge_embed:
        blocks.append(ChargeEmbedding(node_dim=node_dim, activation=activation))
    if spin_embed:
        blocks.append(SpinEmbedding(node_dim=node_dim, activation=activation))
    for _ in range(action_blocks):
        blocks.append(
            EuclideanAttention(
                node_irreps=node_irreps,
                node_dim=node_dim,
                num_heads=num_heads,
                num_basis=num_basis,
                activation=activation,
                layer_norm=layer_norm,
            )
        )
        blocks.append(
            InteractionBlock(
                node_irreps=node_irreps,
                node_dim=node_dim,
                activation=activation,
                layer_norm=layer_norm,
            )
        )
    extra_properties: List[str] = []
    for mode in output_modes:
        head_kwargs = dict(kwargs)
        head_kwargs["node_irreps"] = node_irreps
        blocks.append(resolve_output(mode, **head_kwargs))
        extra_properties.extend(OUTPUT_EXTRA_PROPERTIES[mode])
    return BlockStack(blocks=tuple(blocks)), extra_properties, cutoff


def build_xmatnet(**kwargs: Any):
    from .xmatnet import build_xmatnet as _b

    return _b(**kwargs)


MODEL_BUILDERS = {
    "xpainn": build_xpainn,
    "xpainn-ewald": build_xpainn_ewald,
    "painn": build_painn,
    "so3krates": build_so3krates,
    # QC-matrix learning (QHNet-style; beyond the reference, which ships
    # the matlayer blocks unwired — models/xmatnet.py)
    "xmatnet": build_xmatnet,
}


def resolve_model(model_name: str, **kwargs: Any):
    """Model factory (reference nn/model.py:310-318)."""
    name = model_name.lower()
    if name not in MODEL_BUILDERS:
        raise NotImplementedError(f"Unsupported model {model_name}")
    return MODEL_BUILDERS[name](**kwargs)


def make_apply_forward(module: BlockStack, extra_properties=None):
    """Bind a BlockStack into the trainer's ``apply_forward(params, batch,
    compute_forces, compute_virial)`` signature."""
    from .properties import make_forward

    def apply_forward(params, batch, compute_forces=True, compute_virial=False):
        fwd = make_forward(
            lambda d: module.apply({"params": params}, d), extra_properties
        )
        return fwd(batch, compute_forces, compute_virial)

    return apply_forward


def init_params(module: BlockStack, sample_batch: DataDict, seed: int = 0):
    """Initialize parameters from one (host) sample batch."""
    import jax

    from .properties import compute_edge_data

    data = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    return module.init(jax.random.PRNGKey(seed), compute_edge_data(data))["params"]
