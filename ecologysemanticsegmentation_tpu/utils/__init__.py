"""Tooling/analysis utilities (SURVEY.md §2.1/§2.4 L5 layer)."""

from .colors import COLORS
from .visualize import display_composite_annotations
from .edges import detect_edges, detect_inner_edges, detect_edge_pred_overlap
from .gt_repair import (
    get_bounding_box_from_mask,
    remove_islands_in_segment_gt,
    shoelace_algorithm,
    find_bbox_mask_problems,
    realign_cropped_mask,
    rebuild_bbox_dataset,
)
from .color_distribution import SegmentColorDistribution
from .profiling import MetricsLogger, StepTimer, trace
from .saliency import grad_cam, show_cam_on_image

__all__ = [
    "grad_cam",
    "show_cam_on_image",
    "MetricsLogger",
    "StepTimer",
    "trace",
    "COLORS",
    "display_composite_annotations",
    "detect_edges",
    "detect_inner_edges",
    "detect_edge_pred_overlap",
    "remove_islands_in_segment_gt",
    "shoelace_algorithm",
    "get_bounding_box_from_mask",
    "find_bbox_mask_problems",
    "realign_cropped_mask",
    "rebuild_bbox_dataset",
    "SegmentColorDistribution",
]
