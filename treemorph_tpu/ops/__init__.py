from .projection import (
    Cylinders,
    cylinders_from_dataframe,
    closest_cylinder,
    generate_offset_cloud,
)
from .serialization import encode, serialized_order, z_order_encode, hilbert_encode
from .voxelize import voxelize, voxelize_treelearn_features, VoxelizedCloud
from .neighbors import knn, radius_count
from .features import (
    add_features,
    compute_normals,
    compute_curvature,
    compute_density,
    compute_height,
    compute_verticality,
    compute_distance_to_center,
)

__all__ = [
    "Cylinders",
    "cylinders_from_dataframe",
    "closest_cylinder",
    "generate_offset_cloud",
    "encode",
    "serialized_order",
    "z_order_encode",
    "hilbert_encode",
    "voxelize",
    "voxelize_treelearn_features",
    "VoxelizedCloud",
    "knn",
    "radius_count",
    "add_features",
    "compute_normals",
    "compute_curvature",
    "compute_density",
    "compute_height",
    "compute_verticality",
    "compute_distance_to_center",
]
