from radarml_tpu.drivers.base import (
    DEFAULT_THRESHOLD,
    DriverState,
    RadarDriver,
    RadarSession,
    RadarTarget,
    Status,
    calibrate,
)
from radarml_tpu.drivers.synthetic import ReplayRadar, SyntheticRadar
from radarml_tpu.drivers.walabot import WalabotRadar, walabot_available
from radarml_tpu.drivers.native import (
    NativeRadar,
    NativeScanSource,
    build_library,
    native_available,
)

__all__ = [
    "DEFAULT_THRESHOLD",
    "DriverState",
    "RadarDriver",
    "RadarSession",
    "RadarTarget",
    "Status",
    "calibrate",
    "ReplayRadar",
    "SyntheticRadar",
    "WalabotRadar",
    "walabot_available",
    "NativeRadar",
    "NativeScanSource",
    "build_library",
    "native_available",
]
