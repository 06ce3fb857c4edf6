from tdal.core import codecs, geometry, iou, nms  # noqa: F401
