"""Resampler parity vs scipy.ndimage.zoom and PIL BICUBIC oracles.

These are the hard-parity tests named in SURVEY.md §7 (hard part 1):
the reference uses scipy's order-3 spline zoom in the feature path
(common.py:143) and PIL bicubic in the DNN/SGAN paths (dnn.py:243,
sgan.py:679). Our matrix construction must match both to float32
precision.
"""

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from radarml_tpu.ops.resample import (
    bicubic_resize_matrix,
    bspline_zoom_matrix,
    resample2d,
    zoom_output_size,
)

SHAPES = [(22, 176), (31, 176), (22, 31)]  # native projection shapes
ZOOMS = [(1.0, 1.0), (2.0, 0.5), (80 / 22, 80 / 176), (1.3, 1.3), (0.7, 0.4)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("zoom", ZOOMS)
def test_bspline_zoom_matches_scipy(shape, zoom, rng):
    img = rng.random(shape).astype(np.float64)
    want = ndimage.zoom(img, zoom, order=3)
    R = bspline_zoom_matrix(shape[0], zoom_output_size(shape[0], zoom[0]))
    C = bspline_zoom_matrix(shape[1], zoom_output_size(shape[1], zoom[1]))
    got = R @ img @ C.T
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("n_in,n_out", [(22, 80), (31, 80), (176, 80),
                                        (31, 128), (176, 128), (22, 128),
                                        (128, 176), (128, 31), (128, 22),
                                        (80, 22), (64, 64)])
def test_bicubic_matches_pil(n_in, n_out, rng):
    # Probe the full PIL operator through basis vectors: the resize of
    # eye(n_in) to width n_in, height n_out IS the row operator.
    eye = np.eye(n_in, dtype=np.float32)
    want = np.asarray(
        Image.fromarray(eye).resize((n_in, n_out), resample=Image.BICUBIC)
    )
    got = bicubic_resize_matrix(n_in, n_out)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("shape,out", [((22, 176), (80, 80)), ((31, 176), (128, 128))])
def test_bicubic_full_image_matches_pil(shape, out, rng):
    img = rng.random(shape).astype(np.float32) * 2.0 - 1.0
    # PIL size argument is (width, height).
    want = np.asarray(
        Image.fromarray(img).resize((out[1], out[0]), resample=Image.BICUBIC)
    )
    R = bicubic_resize_matrix(shape[0], out[0])
    C = bicubic_resize_matrix(shape[1], out[1])
    got = R @ img.astype(np.float64) @ C.T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resample2d_batched_matches_host(rng):
    batch = rng.random((16, 22, 176), dtype=np.float32)
    R = bspline_zoom_matrix(22, 80).astype(np.float32)
    C = bspline_zoom_matrix(176, 80).astype(np.float32)
    got = np.asarray(resample2d(batch, R, C))
    for b in range(16):
        want = ndimage.zoom(batch[b].astype(np.float64), (80 / 22, 80 / 176), order=3)
        np.testing.assert_allclose(got[b], want, atol=2e-4)


def test_zoom_output_size_matches_scipy():
    for n in (5, 22, 31, 176):
        for z in (0.3, 0.5, 1.0, 1.7, 80 / 22, 3.99):
            want = ndimage.zoom(np.zeros((n,)), z, order=0).shape[0]
            assert zoom_output_size(n, z) == want, (n, z)


def test_identity_zoom_is_identity(rng):
    img = rng.random((31, 176))
    R = bspline_zoom_matrix(31, 31)
    np.testing.assert_allclose(R @ img, img, atol=1e-10)
