"""Geometry and kernel layer: TPU-native replacements for the reference CUDA ops."""

from ured_tpu.ops.chamfer import (
    calc_cd,
    chamfer_distance,
    chamfer_raw,
    chamfer_reference,
    masked_mean,
    nn_distance,
    pairwise_sqdist,
)
from ured_tpu.ops.dcd import calc_dcd
from ured_tpu.ops.deform import (
    compute_aabbox,
    gather_part_feature,
    get_shape,
    get_symmetric,
    group_points_by_part,
    part_aabb,
    part_segment_mean,
)
from ured_tpu.ops.fscore import fscore
from ured_tpu.ops.knn import knn_graph, knn_points
