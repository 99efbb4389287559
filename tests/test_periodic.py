"""Periodic-box math vs a NumPy oracle of the reference semantics
(_periodic_box_manipulations.py:10-72)."""

import numpy as np
import jax.numpy as jnp

from astro_sph_tools_tpu.ops import (
    make_periodic,
    shift_centre,
    shift_origin,
    wrapped_displacement,
    wrapped_distance,
)


def oracle_displacement(a, b, L):
    d = b - a
    m = np.abs(d) > L / 2
    d[m] = d[m] - np.sign(d[m]) * L
    return d


def oracle_make_periodic(p, L, centre=False):
    p = p.copy()
    if centre:
        half = L / 2
        m = (p < -half) | (p >= half)
        p[m] = -np.sign(p[m] + half) * L + p[m]
    else:
        m = (p < 0.0) | (p >= L)
        p[m] = -np.sign(p[m]) * L + p[m]
    return p


class TestWrappedDisplacement:
    def test_matches_oracle(self, rng):
        L = 25.0
        a = rng.uniform(0, L, size=(512, 3))
        b = rng.uniform(0, L, size=(512, 3))
        expected = oracle_displacement(a.copy(), b, L)
        got = np.asarray(wrapped_displacement(jnp.asarray(a), jnp.asarray(b), L))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-5)

    def test_short_path_chosen(self):
        got = np.asarray(
            wrapped_displacement(jnp.asarray([0.5]), jnp.asarray([24.5]), 25.0)
        )
        np.testing.assert_allclose(got, [-1.0], atol=1e-6)


class TestWrappedDistance:
    def test_matches_oracle_2d(self, rng):
        L = 25.0
        a = rng.uniform(0, L, size=(128, 3))
        b = rng.uniform(0, L, size=(128, 3))
        expected = np.sqrt((oracle_displacement(a.copy(), b, L) ** 2).sum(axis=1))
        got = np.asarray(wrapped_distance(jnp.asarray(a), jnp.asarray(b), L))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_squared_option(self):
        got = float(
            wrapped_distance(
                jnp.asarray([0.0, 0.0, 0.0]),
                jnp.asarray([3.0, 4.0, 0.0]),
                100.0,
                squared=True,
            )
        )
        assert abs(got - 25.0) < 1e-5


class TestMakePeriodic:
    def test_zero_origin(self, rng):
        L = 10.0
        p = rng.uniform(-L, 2 * L, size=(256, 3))
        expected = oracle_make_periodic(p, L, centre=False)
        got = np.asarray(make_periodic(jnp.asarray(p), L))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-5)

    def test_centred_origin(self, rng):
        L = 10.0
        p = rng.uniform(-L, L, size=(256, 3))
        expected = oracle_make_periodic(p, L, centre=True)
        got = np.asarray(make_periodic(jnp.asarray(p), L, origin_is_centre=True))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-5)


class TestShifts:
    def test_shift_origin(self, rng):
        L = 20.0
        p = rng.uniform(0, L, size=(64, 3))
        origin = np.array([18.0, 1.0, 10.0])
        expected = oracle_make_periodic(p - origin, L, centre=False)
        got = np.asarray(shift_origin(jnp.asarray(p), jnp.asarray(origin), L))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-5)

    def test_shift_centre_places_target_at_middle(self):
        L = 20.0
        target = np.array([[3.0, 17.0, 9.0]])
        got = np.asarray(shift_centre(jnp.asarray(target), jnp.asarray(target[0]), L))
        np.testing.assert_allclose(got, [[10.0, 10.0, 10.0]], atol=1e-5)
