"""Reference-compatible tools.projections.create_image surface.

Oracle: a direct NumPy port of the reference's per-pixel gather
(`tools/projections/_pixel_calculations.pyx:9-36`, `_projector.py:75-120`):
corner pixel samples, 3D kernel at the projected radius, r^2 < (2h)^2 mask,
img[xi, yi] x-major indexing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures.particle_types import CoordinateAxes
from astro_sph_tools_tpu.kernels.splines import cubic_spline_kernel
from astro_sph_tools_tpu.tools import create_image, quartic_spline_kernel


def _reference_oracle(pos, h, q, nx, ny, axis, x_min, x_max, y_min, y_max):
    i, j = CoordinateAxes(axis).projection_plane
    ref = np.zeros((nx, ny))
    psx = (x_max - x_min) / nx
    psy = (y_max - y_min) / ny
    for xi in range(nx):
        dx = pos[:, i] - (x_min + xi * psx)
        for yi in range(ny):
            dy = pos[:, j] - (y_min + yi * psy)
            r2 = dx * dx + dy * dy
            m = r2 < (2 * h) ** 2
            w = np.asarray(
                cubic_spline_kernel(jnp.asarray(np.sqrt(r2[m])), jnp.asarray(h[m]))
            )
            ref[xi, yi] = (q[m] * w).sum()
    return ref


@pytest.mark.parametrize(
    "axis",
    [pytest.param(CoordinateAxes.Z, marks=pytest.mark.slow), CoordinateAxes.X],
)
def test_create_image_matches_reference_semantics(axis):
    rng = np.random.default_rng(3)
    n = 2000
    pos = rng.uniform(0, 10, (n, 3))
    h = rng.uniform(0.1, 0.6, n)
    q = rng.uniform(0.5, 2.0, n)
    nx = ny = 32
    img = create_image(pos, h, q, (nx, ny), 16, axis, 0.0, 10.0, 0.0, 10.0)
    ref = _reference_oracle(pos, h, q, nx, ny, axis, 0.0, 10.0, 0.0, 10.0)
    assert img.shape == (nx, ny)
    assert np.abs(img - ref).max() / np.abs(ref).max() < 5e-5


def test_create_image_kernel_choices():
    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 5, (500, 3))
    h = rng.uniform(0.2, 0.5, 500)
    q = np.ones(500)
    a = create_image(pos, h, q, (16, 16), 8, CoordinateAxes.Z, 0, 5, 0, 5)
    b = create_image(
        pos, h, q, (16, 16), 8, CoordinateAxes.Z, 0, 5, 0, 5,
        kernel_func=quartic_spline_kernel,
    )
    c = create_image(
        pos, h, q, (16, 16), 8, CoordinateAxes.Z, 0, 5, 0, 5,
        kernel_func="cubic_spline",
    )
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    with pytest.raises(ValueError):
        create_image(
            pos, h, q, (16, 16), 8, CoordinateAxes.Z, 0, 5, 0, 5,
            kernel_func=lambda r, h: r,
        )


def test_create_image_non_square():
    """The reference's Cython helper used image_size[0] for both pixel sizes
    (bug for non-square images); here each axis uses its own size."""
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, 8, (1000, 3))
    h = rng.uniform(0.2, 0.5, 1000)
    q = np.ones(1000)
    img = create_image(pos, h, q, (24, 12), 8, CoordinateAxes.Z, 0, 8, 0, 4)
    ref = _reference_oracle(pos, h, q, 24, 12, CoordinateAxes.Z, 0, 8, 0, 4)
    assert img.shape == (24, 12)
    assert np.abs(img - ref).max() / np.abs(ref).max() < 5e-5
