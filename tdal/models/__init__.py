"""Model zoo: detection models (CenterPoint family) and Frustum-PointNet auto-labelers.

Importing this package populates the name registries (tdal.runtime.registry) so
configs can dispatch on `type:` strings, mirroring the reference's registry scheme
(det3d/models/registry.py:1-10).
"""

from tdal.models.static_labeler import (  # noqa: F401
    StaticLabelerOneBox,
    StaticLabelerTwoBox,
    frustum_loss_one_box,
    frustum_loss_two_box,
)
from tdal.models.dynamic_labeler import DynamicLabeler, dynamic_loss  # noqa: F401
from tdal.models.detectors import PointPillars, VoxelNet  # noqa: F401
from tdal.models.center_head import CenterHead, SepHead  # noqa: F401
from tdal.models.rpn import RPN  # noqa: F401
from tdal.models.readers import PillarFeatureNet, VoxelMeanEncoder  # noqa: F401
from tdal.models.scn import MiddleBackbone  # noqa: F401
from tdal.models.two_stage import BEVFeatureExtractor, RoIHead  # noqa: F401
from tdal.runtime import registry as _reg

_reg.READERS.register_module(PillarFeatureNet)
_reg.READERS.register_module(VoxelMeanEncoder, name="VoxelFeatureExtractorV3")
_reg.BACKBONES.register_module(MiddleBackbone, name="SpMiddleResNetFHD")
_reg.NECKS.register_module(RPN)
_reg.HEADS.register_module(CenterHead)
_reg.DETECTORS.register_module(PointPillars)
_reg.DETECTORS.register_module(VoxelNet)
_reg.SECOND_STAGE.register_module(BEVFeatureExtractor)
_reg.ROI_HEAD.register_module(RoIHead)
_reg.LABELERS.register_module(StaticLabelerOneBox, name="one_box_est")
_reg.LABELERS.register_module(StaticLabelerTwoBox, name="two_box_est")
_reg.LABELERS.register_module(DynamicLabeler, name="dynamic")
