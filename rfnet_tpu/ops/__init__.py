"""Point-cloud op zoo — TPU-native equivalents of the reference CUDA ops.

Each op in this package replaces one compiled CUDA op family from the
reference (SURVEY.md §2.1):

=====================  =============================================
this module            reference op family
=====================  =============================================
chamfer.nn_distance    NnDistance/NnDistanceGrad
                       (pc_distance/tf_nndistance.{cpp,cu}, tf_ops/CD/)
emd.approx_match       ApproxMatch (pc_distance/tf_approxmatch.cu:1-179)
emd.match_cost         MatchCost/MatchCostGrad (tf_approxmatch.cu:183-295)
emd.approx_match_cost  fused plan-free cost (eval; same recurrence + cost)
emd.approx_match_cost_diff  fused DIFFERENTIABLE cost (train; plan-free
                       value + the reference MatchCostGrad gradients)
auction.auction_match  AuctionMatch (tf_ops/emd/tf_auctionmatch_g.cu)
fps.farthest_point_sample
                       FarthestPointSample (tf_ops/sampling/tf_sampling_g.cu:105-170)
fps.gather_point       GatherPoint/GatherPointGrad (tf_sampling.cpp:41-66)
grouping.query_ball_point
                       QueryBallPoint (tf_ops/grouping/tf_grouping_g.cu:3-36)
grouping.group_point   GroupPoint/GroupPointGrad (tf_grouping_g.cu:40-78)
grouping.knn_point     pure-TF knn (tf_grouping.py:48-73)
interpolate.three_nn   ThreeNN (tf_ops/interpolation/tf_interpolate.cpp)
interpolate.three_interpolate
                       ThreeInterpolate/Grad (tf_interpolate.cpp)
=====================  =============================================

Design: instead of hand-registered ops with explicit gradient kernels, every
op here is a jit-compatible JAX function. Hot pairwise-distance scans have
Pallas TPU kernels (``rfnet_tpu.ops.pallas``); everything else is expressed so
XLA fuses it (distance matrices via MXU matmuls, gathers/scatters as native
HLO). Gradients come from ``jax.custom_vjp`` where the reference ships a
hand-written grad kernel, and from plain autodiff where gather transposes
(scatter-add) already match the reference ``atomicAdd`` kernels.
"""

from rfnet_tpu.ops.chamfer import (
    chamfer_sample_means,
    nearest_neighbor,
    nearest_neighbor_coords,
    nearest_neighbor_pruned,
    nearest_neighbor_tile,
    nn_distance,
    nn_sample_mean_one,
)
from rfnet_tpu.ops.fps import farthest_point_sample, gather_point, sampling
from rfnet_tpu.ops.grouping import group_point, knn_point, query_ball_point
from rfnet_tpu.ops.interpolate import three_interpolate, three_nn
from rfnet_tpu.ops.emd import (
    approx_match,
    approx_match_cost,
    approx_match_cost_diff,
    match_cost,
)
from rfnet_tpu.ops.auction import auction_match

__all__ = [
    "nn_distance",
    "nearest_neighbor",
    "nearest_neighbor_coords",
    "nearest_neighbor_pruned",
    "nearest_neighbor_tile",
    "chamfer_sample_means",
    "nn_sample_mean_one",
    "farthest_point_sample",
    "gather_point",
    "sampling",
    "query_ball_point",
    "group_point",
    "knn_point",
    "three_nn",
    "three_interpolate",
    "approx_match",
    "approx_match_cost",
    "approx_match_cost_diff",
    "match_cost",
    "auction_match",
]
