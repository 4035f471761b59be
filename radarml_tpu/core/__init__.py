from radarml_tpu.core.arena import (
    Arena,
    DEFAULT_ARENA,
    RADAR_MIN,
    RADAR_MAX,
    ProjMask,
    ProjZoom,
    cartesian_to_spherical,
    spherical_to_cartesian,
)

__all__ = [
    "Arena",
    "DEFAULT_ARENA",
    "RADAR_MIN",
    "RADAR_MAX",
    "ProjMask",
    "ProjZoom",
    "cartesian_to_spherical",
    "spherical_to_cartesian",
]
