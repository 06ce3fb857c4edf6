"""Model zoo: detection models (CenterPoint family) and Frustum-PointNet auto-labelers."""

from tdal.models.static_labeler import (  # noqa: F401
    StaticLabelerOneBox,
    StaticLabelerTwoBox,
    frustum_loss_one_box,
    frustum_loss_two_box,
)
from tdal.models.dynamic_labeler import DynamicLabeler, dynamic_loss  # noqa: F401
