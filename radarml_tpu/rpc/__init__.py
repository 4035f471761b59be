from radarml_tpu.rpc.client import (
    BBox,
    CameraInfo,
    Centroid,
    Detection,
    DetectionClient,
    DetectionServerError,
    SERVICE_NAME,
)
from radarml_tpu.rpc.fake_server import DEFAULT_CAMERA, FakeDetectionServer

__all__ = [
    "BBox",
    "CameraInfo",
    "Centroid",
    "Detection",
    "DetectionClient",
    "DetectionServerError",
    "SERVICE_NAME",
    "DEFAULT_CAMERA",
    "FakeDetectionServer",
]
