from .batching import bucket_capacity, collate
from .datapoint import Datapoint
from .dataset import DataLoader, InMemoryDataset, calculate_stats
from .fmt_conversion import (
    datapoint_from_ase,
    datapoint_to_ase,
    datapoint_to_pyscf,
    datapoint_to_xtb,
    read_xyz,
    write_xyz,
)
from .store import XDBDataset, XDBReader, XDBWriter, create_dataset
from .transforms import (
    DeltaTransform,
    NeighborTransform,
    SequentialTransform,
    SVDFrameTransform,
    UnitTransform,
    build_transform_pipeline,
)

__all__ = [
    "Datapoint", "collate", "bucket_capacity",
    "DataLoader", "InMemoryDataset", "calculate_stats",
    "XDBDataset", "XDBReader", "XDBWriter", "create_dataset",
    "NeighborTransform", "UnitTransform", "DeltaTransform",
    "SVDFrameTransform", "SequentialTransform", "build_transform_pipeline",
    "read_xyz", "write_xyz", "datapoint_from_ase", "datapoint_to_ase",
    "datapoint_to_pyscf", "datapoint_to_xtb",
]
