from oryon_tpu.geometry.coords import (
    scale_coords,
    crop_coords,
    decrop_coords,
    valid_coords,
)
from oryon_tpu.geometry.pcd import (
    lift_pcd,
    lift_pcd_at,
    transform_pcd,
    pairwise_dist,
    inv_norm_cosine,
    diameter,
)
from oryon_tpu.geometry.kabsch import (
    kabsch,
    weighted_kabsch,
    ransac_kabsch,
    icp,
    masked_icp,
)
