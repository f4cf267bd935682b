from detectax.ops.pallas.focal import focal_loss_pallas  # noqa: F401
from detectax.ops.pallas.nms_kernel import (  # noqa: F401
    dense_nms_pallas,
    dense_nms_reference,
    suppression_mask_pallas,
)
from detectax.ops.pallas.peak_decode import (  # noqa: F401
    peak_mask_scores_pallas,
    peak_mask_scores_reference,
    peak_scores_pallas,
    peak_scores_reference,
)
