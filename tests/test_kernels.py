"""SPH kernel unit tests against closed-form f64 oracles (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from astro_sph_tools_tpu.kernels import (
    KERNELS,
    cubic_spline_kernel,
    get_kernel,
    integrated_kernel_lookup,
    integrated_kernel_table,
    quartic_spline_kernel,
)


def cubic_spline_oracle(r: np.ndarray, h: np.ndarray) -> np.ndarray:
    """f64 oracle of the reference's kernel (_kernels.pyx:14-19)."""
    q = r / h
    out = np.zeros_like(q)
    inner = q < 1.0
    outer = (q >= 1.0) & (q < 2.0)
    out[inner] = (1 - 1.5 * q[inner] ** 2 + 0.75 * q[inner] ** 3) / (
        np.pi * h[inner] ** 3
    )
    out[outer] = 0.25 * (2 - q[outer]) ** 3 / (np.pi * h[outer] ** 3)
    return out


class TestCubicSpline:
    def test_matches_reference_formula(self, rng):
        r = rng.uniform(0.0, 3.0, size=4096)
        h = rng.uniform(0.5, 2.0, size=4096)
        expected = cubic_spline_oracle(r, h)
        got = np.asarray(cubic_spline_kernel(jnp.asarray(r), jnp.asarray(h)))
        np.testing.assert_allclose(got, expected, rtol=2e-6, atol=1e-7)

    def test_quartic_alias(self):
        # The reference misnames the cubic spline "quartic"; the alias must
        # point at the same function.
        assert quartic_spline_kernel is cubic_spline_kernel

    def test_compact_support_2h(self):
        r = jnp.asarray([2.0, 2.0001, 5.0])
        h = jnp.asarray([1.0, 1.0, 1.0])
        w = np.asarray(cubic_spline_kernel(r, h))
        assert (w == 0.0).all()

    def test_continuous_at_q1(self):
        h = jnp.asarray([1.3, 1.3])
        r = jnp.asarray([1.3 - 1e-6, 1.3 + 1e-6])
        w = np.asarray(cubic_spline_kernel(r, h))
        assert abs(w[0] - w[1]) < 1e-5

    def test_central_value(self):
        # W(0, h) = 1 / (pi h^3)
        w = float(cubic_spline_kernel(jnp.asarray(0.0), jnp.asarray(2.0)))
        assert abs(w - 1.0 / (np.pi * 8.0)) < 1e-8


@pytest.mark.parametrize("name", sorted(KERNELS))
class TestAllKernels:
    def test_normalised_to_unity(self, name):
        """Integral of W over 3D space must be 1 (radial quadrature)."""
        spec = get_kernel(name)
        S = spec.support_factor
        nodes, weights = np.polynomial.legendre.leggauss(512)
        r = 0.5 * S * (nodes + 1.0)
        w = np.asarray(spec.w(jnp.asarray(r), jnp.ones_like(jnp.asarray(r))))
        integral = 4.0 * np.pi * 0.5 * S * np.sum(weights * r**2 * w)
        assert abs(integral - 1.0) < 1e-4

    def test_zero_outside_support(self, name):
        spec = get_kernel(name)
        r = jnp.asarray([spec.support_factor + 1e-3, spec.support_factor * 2])
        w = np.asarray(spec.w(r, jnp.ones_like(r)))
        assert (w == 0.0).all()

    def test_monotone_decreasing(self, name):
        spec = get_kernel(name)
        r = jnp.linspace(0.0, spec.support_factor, 257)
        w = np.asarray(spec.w(r, jnp.ones_like(r)))
        assert (np.diff(w) <= 1e-7).all()

    def test_scaling_with_h(self, name):
        """W(kr, kh) = W(r, h) / k^3."""
        spec = get_kernel(name)
        r = jnp.linspace(0.0, spec.support_factor * 0.99, 64)
        w1 = np.asarray(spec.w(r, jnp.ones_like(r)))
        k = 2.5
        w2 = np.asarray(spec.w(r * k, jnp.full_like(r, k)))
        np.testing.assert_allclose(w2 * k**3, w1, rtol=3e-5, atol=1e-8)


class TestIntegratedKernel:
    def test_column_integral_conserves_mass(self):
        """Integral of Y(b) over the 2D plane must be 1."""
        table = integrated_kernel_table("cubic_spline")
        spec = get_kernel("cubic_spline")
        S = spec.support_factor
        nodes, weights = np.polynomial.legendre.leggauss(512)
        b = 0.5 * S * (nodes + 1.0)
        y = np.asarray(
            integrated_kernel_lookup(
                jnp.asarray(table), jnp.asarray(b), jnp.ones_like(jnp.asarray(b)), S
            )
        )
        integral = 2.0 * np.pi * 0.5 * S * np.sum(weights * b * y)
        assert abs(integral - 1.0) < 1e-3

    def test_central_column_value(self):
        """Y(0, h) = 2 * int_0^S W(z, h) dz, checked by direct quadrature."""
        table = integrated_kernel_table("cubic_spline")
        spec = get_kernel("cubic_spline")
        z = np.linspace(0.0, spec.support_factor, 20001)
        w = np.asarray(spec.w(jnp.asarray(z), jnp.ones_like(jnp.asarray(z))))
        expected = 2.0 * np.trapezoid(w, z)
        got = float(
            integrated_kernel_lookup(
                jnp.asarray(table), jnp.asarray(0.0), jnp.asarray(1.0), spec.support_factor
            )
        )
        assert abs(got - expected) < 1e-4
