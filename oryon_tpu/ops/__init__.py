from oryon_tpu.ops.sampling import masked_select, masked_sample
from oryon_tpu.ops.matching import (
    nn_correspondences,
    nn_correspondences_anchors,
    MatchParams,
)
