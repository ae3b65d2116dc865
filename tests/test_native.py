"""Native C++ neighbor search must agree with the numpy reference, and be
substantially faster at scale."""

import time

import numpy as np
import pytest

from xequinet_tpu.ops.native import get_lib, radius_graph_native
from xequinet_tpu.ops.radius_graph import (
    _num_repeats,
    radius_graph_np,
    radius_graph_pbc_np,
)

needs_native = pytest.mark.skipif(get_lib() is None, reason="no g++ toolchain")


@needs_native
@pytest.mark.parametrize("n", [10, 100, 500])
def test_native_matches_numpy(n, rng):
    pos = rng.normal(size=(n, 3)) * (n ** (1 / 3))
    ei_native, _ = radius_graph_native(pos, 3.0)
    ei_np, _ = radius_graph_np(pos, 3.0, use_native=False)
    got = set(zip(ei_native[0].tolist(), ei_native[1].tolist()))
    want = set(zip(ei_np[0].tolist(), ei_np[1].tolist()))
    assert got == want
    # center-major sorted
    assert (np.diff(ei_native[0]) >= 0).all()


@needs_native
def test_native_pbc_matches_numpy(rng):
    cell = np.diag([5.0, 5.5, 6.0]) + rng.normal(size=(3, 3)) * 0.2
    pos = rng.uniform(0, 1, size=(12, 3)) @ cell + rng.normal(size=(12, 3))
    pbc = np.ones(3, bool)
    ei_a, off_a = radius_graph_pbc_np(pos, cell, pbc, 3.0)  # native path
    # force numpy path by rebuilding internals
    import xequinet_tpu.ops.radius_graph as rgmod
    import xequinet_tpu.ops.native as natmod

    orig = natmod.radius_graph_pbc_native
    natmod.radius_graph_pbc_native = lambda *a, **k: None
    try:
        ei_b, off_b = radius_graph_pbc_np(pos, cell, pbc, 3.0)
    finally:
        natmod.radius_graph_pbc_native = orig
    got = {(*map(int, e), *map(int, o)) for e, o in zip(ei_a.T, off_a)}
    want = {(*map(int, e), *map(int, o)) for e, o in zip(ei_b.T, off_b)}
    assert got == want


@needs_native
def test_native_is_faster_at_scale(rng):
    n = 4000
    pos = rng.normal(size=(n, 3)) * (n ** (1 / 3))
    t0 = time.perf_counter()
    ei_nat, _ = radius_graph_native(pos, 3.0)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    ei_np, _ = radius_graph_np(pos, 3.0, use_native=False)
    t_np = time.perf_counter() - t0
    assert ei_nat.shape[1] == ei_np.shape[1]
    # cell lists should beat the N^2 numpy broadcast comfortably
    assert t_nat < t_np, (t_nat, t_np)
