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
from ured_tpu.ops.dcd import calc_dcd_full
from ured_tpu.ops.emd import calc_emd, emd_auction
from ured_tpu.ops.expansion import expansion_penalty
from ured_tpu.ops.fscore import fscore
from ured_tpu.ops.knn import knn_graph, knn_points
from ured_tpu.ops.sampling import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    sample_and_group,
    three_interpolate,
    three_nn,
)
from ured_tpu.ops.voxel import (
    cubic_feature_sampling,
    gridding,
    gridding_reverse,
)
