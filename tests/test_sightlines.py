"""Sightline integration vs dense f64 oracles."""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.sightlines import column_integrate, los_profiles
from oracles import cubic_spline_w


def column_oracle_kernel3d(x, y, h, q, rx, ry):
    out = np.zeros(len(rx))
    for r in range(len(rx)):
        b2 = (x - rx[r]) ** 2 + (y - ry[r]) ** 2
        mask = b2 < (2 * h) ** 2
        out[r] = np.sum(q[mask] * cubic_spline_w(np.sqrt(b2[mask]), h[mask]))
    return out


class TestColumnIntegrate:
    def test_kernel3d_matches_oracle(self, rng):
        n, r = 3000, 32
        x = rng.uniform(0, 10, n)
        y = rng.uniform(0, 10, n)
        h = rng.uniform(0.2, 0.6, n)
        q = rng.uniform(0.5, 2.0, n)
        rx = rng.uniform(0, 10, r)
        ry = rng.uniform(0, 10, r)
        got = np.asarray(column_integrate(x, y, h, q, rx, ry, projection="kernel3d"))
        expected = column_oracle_kernel3d(x, y, h, q, rx, ry)
        np.testing.assert_allclose(got, expected, rtol=2e-5)

    def test_integrated_total_mass(self, rng):
        """A dense ray grid times cell area recovers the total mass."""
        n = 400
        x = rng.uniform(4, 6, n)
        y = rng.uniform(4, 6, n)
        h = rng.uniform(0.1, 0.2, n)
        m = rng.uniform(0.5, 2.0, n)
        g = np.linspace(3, 7, 81)
        gx, gy = np.meshgrid(0.5 * (g[:-1] + g[1:]), 0.5 * (g[:-1] + g[1:]))
        cols = np.asarray(
            column_integrate(x, y, h, m, gx.ravel(), gy.ravel(), projection="integrated")
        )
        cell = (g[1] - g[0]) ** 2
        assert abs(cols.sum() * cell / m.sum() - 1.0) < 1e-2

    def test_multifield(self, rng):
        n, r = 500, 8
        x = rng.uniform(0, 10, n); y = rng.uniform(0, 10, n)
        h = rng.uniform(0.3, 0.5, n)
        m = rng.uniform(0.5, 2.0, n)
        t = rng.uniform(1e4, 1e6, n)
        rx = rng.uniform(0, 10, r); ry = rng.uniform(0, 10, r)
        both = np.asarray(
            column_integrate(x, y, h, np.stack([m, m * t], 1), rx, ry, projection="kernel3d")
        )
        solo = np.asarray(column_integrate(x, y, h, m, rx, ry, projection="kernel3d"))
        np.testing.assert_allclose(both[0], solo, rtol=1e-6)

    def test_periodic_wrap(self, rng):
        n = 200
        x = rng.uniform(0, 0.2, n)  # particles at x~0
        y = rng.uniform(0, 10, n)
        h = np.full(n, 0.4)
        q = np.ones(n)
        # ray just over the wrap at x=9.9 must see them
        got = np.asarray(
            column_integrate(x, y, h, q, np.array([9.9]), np.array([5.0]),
                             projection="kernel3d", periodic_box=10.0)
        )
        assert got[0] > 0


class TestLosProfiles:
    def test_profile_matches_pointwise_oracle(self, rng):
        n, r, b = 800, 4, 16
        pos = rng.uniform(0, 10, (n, 3))
        h = rng.uniform(0.4, 0.8, n)
        q = rng.uniform(0.5, 2.0, n)
        rx = rng.uniform(2, 8, r)
        ry = rng.uniform(2, 8, r)
        prof = np.asarray(
            los_profiles(pos, h, q, rx, ry, z_range=(0.0, 10.0), n_bins=b)
        )
        assert prof.shape == (r, b)
        z_centres = (np.arange(b) + 0.5) * (10.0 / b)
        for ri in range(r):
            for bi in range(0, b, 5):
                d2 = (
                    (pos[:, 0] - rx[ri]) ** 2
                    + (pos[:, 1] - ry[ri]) ** 2
                    + (pos[:, 2] - z_centres[bi]) ** 2
                )
                mask = d2 < (2 * h) ** 2
                expected = np.sum(q[mask] * cubic_spline_w(np.sqrt(d2[mask]), h[mask]))
                assert prof[ri, bi] == pytest.approx(expected, rel=3e-5, abs=1e-7)

    def test_weighted_mean_profile(self, rng):
        """m-weighted T profile of a constant-T gas recovers T."""
        n, b = 1500, 8
        pos = rng.uniform(0, 10, (n, 3))
        h = rng.uniform(0.6, 1.0, n)
        m = rng.uniform(0.5, 2.0, n)
        t0 = 3.7e5
        fields = np.stack([m, m * t0], axis=1)
        prof = np.asarray(
            los_profiles(pos, h, fields, np.array([5.0]), np.array([5.0]),
                         z_range=(0.0, 10.0), n_bins=b)
        )
        dens, mt = prof[0, 0], prof[1, 0]
        covered = dens > dens.max() * 1e-3
        np.testing.assert_allclose(mt[covered] / dens[covered], t0, rtol=1e-4)


class TestColumnIntegrateBinned:
    """Cell-binned production engine vs the dense sweep (exact same math)."""

    @pytest.mark.parametrize("projection", ["integrated", "kernel3d"])
    @pytest.mark.parametrize("periodic", [False, True])
    def test_matches_dense(self, rng, projection, periodic):
        from astro_sph_tools_tpu.ops.sightlines import column_integrate_binned

        n, R = 6000, 300
        box = 10.0
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        x[:600] = rng.uniform(0, 0.05, 600)  # periodic edge hugging
        h = 10.0 ** rng.uniform(-1.5, -0.2, n)
        m = rng.uniform(0.5, 2.0, n)
        vals = np.stack([m, m * rng.uniform(1, 2, n)], axis=1)
        rx = rng.uniform(0, box, R)
        ry = rng.uniform(0, box, R)
        rx[:30] = rng.uniform(0, 0.01, 30)
        ry[30:60] = rng.uniform(box - 0.01, box, 30)
        per = box if periodic else None
        dense = np.asarray(
            column_integrate(x, y, h, vals, rx, ry, projection=projection, periodic_box=per)
        )
        binned = np.asarray(
            column_integrate_binned(
                x, y, h, vals, rx, ry, projection=projection, periodic_box=per
            )
        )
        assert np.abs(dense - binned).max() / np.abs(dense).max() < 1e-5

    def test_single_field_and_uniform_h(self, rng):
        from astro_sph_tools_tpu.ops.sightlines import column_integrate_binned

        n, R = 2000, 100
        box = 5.0
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = np.full(n, 0.1)
        m = np.ones(n)
        rx = rng.uniform(0, box, R)
        ry = rng.uniform(0, box, R)
        dense = np.asarray(column_integrate(x, y, h, m, rx, ry))
        binned = np.asarray(column_integrate_binned(x, y, h, m, rx, ry))
        assert binned.shape == (R,)
        assert np.abs(dense - binned).max() / np.abs(dense).max() < 1e-5
