from oryon_tpu.losses.mask_losses import dice_loss, bce_loss, focal_loss, lovasz_hinge
from oryon_tpu.losses.feature_loss import feature_loss, FeatureLossConfig, LossOutputs
