"""Convert a reference XequiNet LMDB dataset into an XDB dataset.

Run this in an environment with ``lmdb``, ``torch`` and
``torch_geometric`` installed (they are only needed to *read* the source;
the produced XDB directory is consumed torch-free by xequinet-tpu):

    python tools/convert_lmdb_dataset.py <src_dir> <dst_dir> [--split split]

Source layout (reference xequinet/data/lmdb_data.py): ``data.lmdb`` with
little-endian uint64 keys -> pickled XequiData, plus ``info.json`` (units)
and ``<split>.json`` (train/valid/test indices).  The same info/split
contract is preserved in the output.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path


def convert(src: Path, dst: Path, split_name: str = "split") -> None:
    import lmdb  # noqa: F401 (import error = helpful message below)
    import numpy as np

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.data.store import XDBWriter

    env = lmdb.open(
        str(src / "data.lmdb"),
        readonly=True,
        lock=False,
        subdir=False,
        map_size=2**40,
    )
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    with env.begin() as txn, XDBWriter(dst / "data.xdb") as writer:
        cursor = txn.cursor()
        for _key, value in cursor:
            data = pickle.loads(value)  # torch_geometric XequiData

            def arr(name):
                v = getattr(data, name, None)
                return None if v is None else np.asarray(v.detach().cpu())

            def scalar(name):
                v = arr(name)
                return None if v is None else v.reshape(-1)[0].item()

            kw = dict(
                atomic_numbers=arr("atomic_numbers"),
                pos=arr("pos"),
            )
            cell = arr("cell")
            pbc = arr("pbc")
            if cell is not None:
                kw["cell"] = cell.reshape(3, 3)
                kw["pbc"] = (
                    pbc.reshape(3) if pbc is not None else np.ones(3, bool)
                )
            for field, attr in [
                ("energy", "energy"),
                ("base_energy", "base_energy"),
                ("charge", "charge"),
                ("spin", "spin"),
            ]:
                v = scalar(attr)
                if v is not None:
                    kw[field] = v
            for field in (
                "forces",
                "base_forces",
                "virial",
                "atomic_charges",
                "base_charges",
                "dipole",
                "base_dipole",
                "polar",
            ):
                v = arr(field)
                if v is not None:
                    kw[field] = np.squeeze(v) if field in (
                        "virial", "dipole", "base_dipole", "polar"
                    ) else v
            writer.append(Datapoint(**kw))
            n += 1

    info_src = src / "info.json"
    info = json.loads(info_src.read_text()) if info_src.exists() else {}
    info["num_records"] = n
    (dst / "info.json").write_text(json.dumps(info, indent=1))
    split_src = src / f"{split_name}.json"
    if split_src.exists():
        (dst / f"{split_name}.json").write_text(split_src.read_text())
    print(f"converted {n} records -> {dst}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("src", type=Path)
    ap.add_argument("dst", type=Path)
    ap.add_argument("--split", default="split")
    args = ap.parse_args()
    try:
        convert(args.src, args.dst, args.split)
    except ImportError as e:
        raise SystemExit(
            f"missing dependency for reading the LMDB source: {e}. Install "
            "lmdb + torch + torch_geometric in the conversion environment."
        )
