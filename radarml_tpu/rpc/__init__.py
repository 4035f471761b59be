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
from radarml_tpu.rpc.radar_server import (  # noqa: E402
    RadarServingClient,
    RadarServingError,
    RadarServingServer,
)

__all__ += [
    "RadarServingClient",
    "RadarServingError",
    "RadarServingServer",
]
