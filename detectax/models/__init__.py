from detectax.models.backbones import build_backbone  # noqa: F401
from detectax.models.centernet import (  # noqa: F401
    CenterNetFPNSingle,
    CenterNetS8,
    HourglassNet,
    StackedHourglass,
)
from detectax.models.fcos import FCOS  # noqa: F401
from detectax.models.retinanet import RetinaNet  # noqa: F401
