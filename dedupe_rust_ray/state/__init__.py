from .unionfind import UnionFind, driver_connected_components, distributed_connected_components
from .checkpoint import read_manifest, stage_checkpoint

__all__ = [
    "UnionFind",
    "driver_connected_components",
    "distributed_connected_components",
    "stage_checkpoint",
    "read_manifest",
]
