from .cov_mmd_1nna import compute_cd, compute_cov_mmd_1nna, compute_dcd, compute_emd
from .depth import compute_depth_accuracy, compute_depth_error
from .distance import (
    approx_match,
    chamfer_distance,
    density_aware_chamfer_distance,
    earth_mover_distance,
    fscore,
    match_cost,
    pairwise_sqdist,
)
from .fpd_kpd import compute_frechet_distance, compute_squared_mmd
from .fps import downsample_point_clouds, furthest_point_sampling, gather_points
from .jsd import compute_jsd, entropy_of_occupancy_grid
from .pallas_emd import emd_pallas, emd_pallas_available
from .pointnet import init_pointnet_params, load_torch_state_dict, pointnet_features
from .swd import compute_swd

__all__ = [
    "compute_cd",
    "compute_cov_mmd_1nna",
    "compute_dcd",
    "compute_emd",
    "compute_depth_accuracy",
    "compute_depth_error",
    "approx_match",
    "chamfer_distance",
    "density_aware_chamfer_distance",
    "earth_mover_distance",
    "fscore",
    "match_cost",
    "pairwise_sqdist",
    "compute_frechet_distance",
    "compute_squared_mmd",
    "downsample_point_clouds",
    "furthest_point_sampling",
    "gather_points",
    "compute_jsd",
    "entropy_of_occupancy_grid",
    "init_pointnet_params",
    "load_torch_state_dict",
    "pointnet_features",
    "compute_swd",
    "emd_pallas",
    "emd_pallas_available",
]
