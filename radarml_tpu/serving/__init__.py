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
    "StreamConfig",
    "StreamingClassifier",
    "driver_scan_source",
    "native_scan_source",
]
