"""Native host-staging kernels vs their NumPy formulations."""

import numpy as np
import pytest

from astro_sph_tools_tpu import native
from astro_sph_tools_tpu.ops.deposit_pallas import (
    _LEVEL_STRIDE,
    _level_geometry,
    _multi_level_assign,
    PALLAS_LEVELS,
)
from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.kernels.splines import get_kernel

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no C toolchain available"
)


@pytest.mark.parametrize("periodic", [True, False])
def test_assign_tiles_matches_numpy(periodic):
    rng = np.random.default_rng(0)
    n, box = 50000, 20.0
    spec = MapSpec(shape=(512, 512), extent=(0.0, box, 0.0, box), periodic_wrap=periodic)
    # include out-of-extent and boundary-straddling points
    x = rng.uniform(-2.0, box + 2.0, n)
    y = rng.uniform(-2.0, box + 2.0, n)
    h = np.exp(rng.normal(np.log(0.05), 1.2, n)).clip(1e-3, 5.0).astype(np.float32)

    kspec = get_kernel("cubic_spline")
    geoms = []
    for cfg in PALLAS_LEVELS:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)
    bounds = tuple((g.cfg.max_s_pix if g is not None else -1.0) for g in geoms)
    ntx = tuple(g.n_tiles_x if g else 1 for g in geoms)
    th = tuple(g.cfg.TY if g else 1 for g in geoms)
    tw = tuple(g.tx if g else 1 for g in geoms)
    nty = tuple(g.n_tiles_y if g else 1 for g in geoms)
    marg = tuple(g.cfg.M if g else 0 for g in geoms)

    ny, nx = spec.shape
    x0, x1, y0, y1 = spec.extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny

    got = native.assign_tiles_f64(
        x, y, h, x0=x0, y0=y0, psx=psx, psy=psy, nx=nx, ny=ny,
        periodic=periodic, support_factor=kspec.support_factor,
        bounds=bounds, ntx=ntx, nty=nty, tw=tw, th=th, marg=marg,
        stride=_LEVEL_STRIDE,
    )
    assert got is not None
    key_c, u_c, v_c = got

    u = (x - x0) / psx
    v = (y - y0) / psy
    if periodic:
        u = np.mod(u, nx)
        v = np.mod(v, ny)
    s_pix = kspec.support_factor * h.astype(np.float64) / min(psx, psy)
    level, tile, u_np, v_np = _multi_level_assign(
        u, v, s_pix, bounds, ntx, th, tw, nty, marg, np
    )
    key_np = (level * _LEVEL_STRIDE + tile).astype(np.int32)

    np.testing.assert_array_equal(key_c, key_np)
    np.testing.assert_array_equal(u_c, u_np.astype(np.float32))
    np.testing.assert_array_equal(v_c, v_np.astype(np.float32))


def test_scale_cast_matches_numpy():
    rng = np.random.default_rng(1)
    for dt in (np.float64, np.float32):
        a = rng.uniform(-1e8, 1e8, 10000).astype(dt)
        got = native.scale_cast(a, 1.989e-13)
        assert got is not None
        ref = (a.astype(np.float64) * 1.989e-13).astype(np.float32)
        np.testing.assert_array_equal(got, ref)
