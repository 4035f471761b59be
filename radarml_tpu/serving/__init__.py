from radarml_tpu.serving.export import (
    ServingArtifact,
    export_predictor,
    load_serving_artifact,
)
from radarml_tpu.serving.reload import ModelReloader
from radarml_tpu.serving.stream import (
    Detection,
    Scan,
    StreamConfig,
    StreamingClassifier,
    driver_scan_source,
    native_scan_source,
)

__all__ = [
    "Detection",
    "Scan",
    "ServingArtifact",
    "StreamConfig",
    "StreamingClassifier",
    "driver_scan_source",
    "export_predictor",
    "load_serving_artifact",
    "ModelReloader",
    "native_scan_source",
]
