from .figures import (
    plot_epoch_time_comparison,
    plot_distance_heatmap,
    plot_offset_slices,
    plot_upsampling_visual,
    qsm_csv_to_ply,
)

__all__ = [
    "plot_epoch_time_comparison",
    "plot_distance_heatmap",
    "plot_offset_slices",
    "plot_upsampling_visual",
    "qsm_csv_to_ply",
]
