"""Convert a reference XequiNet LMDB dataset into an XDB dataset.

Run this in an environment with ``lmdb`` and ``torch`` installed (torch_geometric is NOT needed —
the tolerant unpickler in xequinet_tpu.data.lmdb_reader handles the
PyG payloads); the produced XDB directory is consumed torch-free:

    python tools/convert_lmdb_dataset.py <src_dir> <dst_dir> [--split split]

Source layout (reference xequinet/data/lmdb_data.py): ``data.lmdb`` with
little-endian uint64 keys -> pickled XequiData, plus ``info.json`` (units)
and ``<split>.json`` (train/valid/test indices).  The same info/split
contract is preserved in the output.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def convert(src: Path, dst: Path, split_name: str = "split") -> None:
    import lmdb  # noqa: F401 (import error = helpful message below)

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from xequinet_tpu.data.store import XDBWriter

    from xequinet_tpu.data.lmdb_reader import (
        record_to_datapoint,
        tolerant_loads,
    )

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
            # tolerant unpickling: torch_geometric need not be installed
            writer.append(record_to_datapoint(tolerant_loads(bytes(value))))
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
