"""Driver layer: state machine, synthetic/replay backends, native C++ source."""

import numpy as np
import pytest

from radarml_tpu.core.arena import Arena
from radarml_tpu.drivers import (
    DriverState,
    RadarSession,
    RadarTarget,
    ReplayRadar,
    Status,
    SyntheticRadar,
    calibrate,
    native_available,
)
from radarml_tpu.drivers.base import StateError

ARENA = Arena()  # default 22x31x176


def test_state_machine_enforced():
    d = SyntheticRadar(arena=ARENA)
    with pytest.raises(StateError):
        d.trigger()
    with pytest.raises(StateError):
        d.start()
    d.connect()
    with pytest.raises(StateError):
        d.start()  # must configure first
    d.configure()
    d.start()
    d.trigger()
    assert d.get_raw_image().shape == ARENA.grid_shape
    d.stop()
    with pytest.raises(StateError):
        d.trigger()
    d.disconnect()
    assert d.state == DriverState.CREATED


def test_synthetic_scan_contents():
    d = SyntheticRadar(arena=ARENA, seed=7, max_targets=2)
    with RadarSession(d) as r:
        r.trigger()
        cube = r.get_raw_image()
        targets = r.get_sensor_targets()
    assert cube.dtype == np.float32
    assert 0.0 <= cube.min() and cube.max() <= 255.0
    assert 1 <= len(targets) <= 2
    for t in targets:
        assert t.z > 0  # in front of the radar
    assert len(d.truth_labels) == len(targets)


def test_synthetic_determinism():
    def scans(seed):
        d = SyntheticRadar(arena=ARENA, seed=seed)
        with RadarSession(d) as r:
            r.trigger()
            return r.get_raw_image().copy()

    np.testing.assert_array_equal(scans(3), scans(3))
    assert not np.array_equal(scans(3), scans(4))


def test_calibration_loop_runs_when_mti_off():
    d = SyntheticRadar(arena=ARENA, mti=False, calibration_triggers=4)
    d.connect()
    d.configure()
    d.start()
    assert d.get_status()[0] == Status.CALIBRATING
    n = calibrate(d)
    assert n == 4
    assert d.get_status()[0] == Status.CLEAN
    d.disconnect()


def test_replay_round_trip():
    rng = np.random.default_rng(0)
    scans = [
        (rng.random(ARENA.grid_shape).astype(np.float32),
         [RadarTarget(1.0, 2.0, 100.0, 50.0)]),
        (rng.random(ARENA.grid_shape).astype(np.float32), []),
    ]
    d = ReplayRadar(arena=ARENA, scans=scans)
    with RadarSession(d) as r:
        r.trigger()
        np.testing.assert_array_equal(r.get_raw_image(), scans[0][0])
        assert r.get_sensor_targets() == [RadarTarget(1.0, 2.0, 100.0, 50.0)]
        r.trigger()
        assert r.get_sensor_targets() == []
        r.trigger()  # loops
        np.testing.assert_array_equal(r.get_raw_image(), scans[0][0])


needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_source_synthetic_stream():
    from radarml_tpu.drivers import NativeScanSource

    src = NativeScanSource(arena=ARENA, seed=5)
    src.start()
    try:
        out = src.next(timeout_s=5.0)
        assert out is not None
        cube, targets, seq = out
        assert cube.shape == ARENA.grid_shape
        assert cube.max() <= 255.0 and cube.min() >= 0.0
        assert len(targets) >= 1
        i, j, k, amp = targets[0]
        # planted blob actually present near the reported cell
        assert cube[int(i), int(j), int(k)] > 50.0
        out2 = src.next(timeout_s=5.0)
        assert out2 is not None and out2[2] != seq
    finally:
        src.close()


@needs_native
def test_native_source_replay_pool():
    from radarml_tpu.drivers import NativeScanSource

    rng = np.random.default_rng(1)
    cubes = rng.random((3,) + ARENA.grid_shape).astype(np.float32)
    targets = [np.array([[1, 2, 3, 9.0]]), np.zeros((0, 4)), np.array([[4, 5, 6, 7.0]])]
    src = NativeScanSource(arena=ARENA, mode="replay")
    src.load_pool(cubes, targets)
    src.start()
    try:
        seen = []
        for _ in range(4):
            out = src.next(timeout_s=5.0)
            assert out is not None
            cube, rows, seq = out
            seen.append((seq % 3, rows.shape[0]))
            np.testing.assert_array_equal(cube, cubes[seq % 3])
        assert {s for s, _ in seen} <= {0, 1, 2}
    finally:
        src.close()


@needs_native
def test_native_radar_driver_end_to_end():
    from radarml_tpu.drivers import NativeRadar

    d = NativeRadar(arena=ARENA, seed=11)
    with RadarSession(d) as r:
        r.trigger()
        cube = r.get_raw_image()
        targets = r.get_sensor_targets()
    assert cube.shape == ARENA.grid_shape
    assert targets and targets[0].z > 0
