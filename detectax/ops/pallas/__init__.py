from detectax.ops.pallas.focal import focal_loss_pallas  # noqa: F401
from detectax.ops.pallas.nms_kernel import suppression_mask_pallas  # noqa: F401
from detectax.ops.pallas.peak_decode import peak_scores_pallas  # noqa: F401
