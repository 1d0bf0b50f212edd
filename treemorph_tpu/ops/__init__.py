from .projection import (
    Cylinders,
    cylinders_from_dataframe,
    closest_cylinder,
    generate_offset_cloud,
)

__all__ = [
    "Cylinders",
    "cylinders_from_dataframe",
    "closest_cylinder",
    "generate_offset_cloud",
]
