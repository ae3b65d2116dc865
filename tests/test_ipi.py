"""i-Pi protocol driver test: a fake i-Pi server exchanges one force call
with the driver over a local socket."""

import socket
import struct
import threading

import numpy as np
import pytest


def _send_header(sock, msg):
    sock.sendall(msg.ljust(12).encode())


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        c = sock.recv(n - len(buf))
        assert c
        buf += c
    return buf


def test_ipi_driver_roundtrip(tmp_path, rng):
    # train-free checkpoint via the pipeline fixture machinery is heavy;
    # build a tiny model checkpoint directly
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.ops.radius_graph import radius_graph_np
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    z = rng.integers(1, 5, 5).astype(np.int32)
    pos = rng.normal(size=(5, 3)) * 1.4
    ei, _ = radius_graph_np(pos, 5.0)
    dp = Datapoint(z, pos, edge_index=ei)
    kw = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e", embed_basis="one-hot",
              num_basis=8, action_blocks=1, output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    params = init_params(module, collate([dp]))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(
        str(ckpt), params,
        config_to_dict(ModelConfig(model_name="xpainn", model_kwargs=kw)),
    )

    from xequinet_tpu.interface.ipi_driver import IPIDriver
    from xequinet_tpu.utils.qc import units

    bohr_per_ang = units["Angstrom"]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("localhost", 0))
    port = server.getsockname()[1]
    server.listen(1)

    result = {}

    def fake_ipi_server():
        conn, _ = server.accept()
        # one MD step: STATUS -> READY, POSDATA, STATUS -> HAVEDATA, GETFORCE
        _send_header(conn, "STATUS")
        assert _recv_exact(conn, 12).decode().strip() == "READY"
        _send_header(conn, "POSDATA")
        cell = np.zeros((3, 3))
        conn.sendall(cell.astype("<f8").tobytes())
        conn.sendall(cell.astype("<f8").tobytes())
        conn.sendall(struct.pack("<i", 5))
        conn.sendall((pos * bohr_per_ang).astype("<f8").tobytes())
        _send_header(conn, "STATUS")
        assert _recv_exact(conn, 12).decode().strip() == "HAVEDATA"
        _send_header(conn, "GETFORCE")
        assert _recv_exact(conn, 12).decode().strip() == "FORCEREADY"
        (e,) = struct.unpack("<d", _recv_exact(conn, 8))
        (n,) = struct.unpack("<i", _recv_exact(conn, 4))
        f = np.frombuffer(_recv_exact(conn, 24 * n), dtype="<f8").reshape(n, 3)
        _v = _recv_exact(conn, 72)
        (nextra,) = struct.unpack("<i", _recv_exact(conn, 4))
        assert nextra == 0
        result["energy"] = e
        result["forces"] = f
        _send_header(conn, "EXIT")
        conn.close()

    t = threading.Thread(target=fake_ipi_server)
    t.start()
    driver = IPIDriver(str(ckpt), z, address="localhost", port=port)
    steps = driver.run()
    t.join(timeout=30)
    assert steps == 1
    assert np.isfinite(result["energy"])
    assert result["forces"].shape == (5, 3)
    assert np.isfinite(result["forces"]).all()

    # cross-check against the Calculator directly (model units -> a.u.)
    res = driver.calc.calculate(z, pos)
    from xequinet_tpu import keys
    from xequinet_tpu.utils.qc import get_default_units, unit_conversion

    u = get_default_units()
    e_conv = unit_conversion(u.get(keys.TOTAL_ENERGY, "eV"), "Hartree")
    np.testing.assert_allclose(
        result["energy"], res[keys.TOTAL_ENERGY] * e_conv, rtol=1e-5
    )
