from oryon_tpu.eval.metrics import (
    mask_iou,
    rotation_translation_errors,
    compute_add,
    compute_adds,
    fmr,
)
from oryon_tpu.eval.bop import mssd, mspd, vsd_errors
