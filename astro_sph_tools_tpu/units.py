"""Minimal dimensional-units layer.

The reference carries all user-facing data in ``unyt`` arrays
(`/root/reference/src/astro_sph_tools/io/data_structures/_SnapshotBase.py:28-41`
documents the convention: co-moving, h-full, Mpc/Msun/km/s/K). ``unyt`` is not
available in this image, so this module provides a small, fast, dependency-free
equivalent: a CGS-based dimensional algebra plus a thin ``UnitArray`` wrapper
that works over NumPy *and* JAX arrays (conversions are scalar multiplies, so
they trace cleanly under ``jit``).

Only the unit surface the framework needs is registered; unknown symbols raise
``UnknownUnitError``. Dimensions are tracked as rational exponents over
(length, mass, time, temperature), which is sufficient for every quantity the
reference handles.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Any, Union

import numpy as np

from . import constants as C


class UnknownUnitError(KeyError):
    """Raised when a unit symbol is not in the registry."""


class UnitConversionError(ValueError):
    """Raised when converting between incompatible dimensions."""


# Dimension vector: exponents of (length, mass, time, temperature).
Dims = tuple[Fraction, Fraction, Fraction, Fraction]

_DIMENSIONLESS: Dims = (Fraction(0), Fraction(0), Fraction(0), Fraction(0))


def _dims(L=0, M=0, T=0, K=0) -> Dims:
    return (Fraction(L), Fraction(M), Fraction(T), Fraction(K))


@dataclass(frozen=True)
class Unit:
    """A unit: a scale factor to CGS base plus a dimension vector."""

    scale: float
    dims: Dims
    symbol: str = ""

    # -- algebra ------------------------------------------------------------
    def __mul__(self, other: "Unit") -> "Unit":
        return Unit(
            self.scale * other.scale,
            tuple(a + b for a, b in zip(self.dims, other.dims)),
            _join_symbols(self.symbol, other.symbol, "*"),
        )

    def __truediv__(self, other: "Unit") -> "Unit":
        return Unit(
            self.scale / other.scale,
            tuple(a - b for a, b in zip(self.dims, other.dims)),
            _join_symbols(self.symbol, other.symbol, "/"),
        )

    def __pow__(self, exponent) -> "Unit":
        e = Fraction(exponent).limit_denominator(1000)
        return Unit(
            float(self.scale) ** float(e),
            tuple(d * e for d in self.dims),
            f"({self.symbol})**{exponent}" if self.symbol else "",
        )

    @property
    def is_dimensionless(self) -> bool:
        return self.dims == _DIMENSIONLESS

    def conversion_factor_to(self, other: "Unit") -> float:
        if self.dims != other.dims:
            raise UnitConversionError(
                f"Cannot convert '{self.symbol}' {self.dims} to "
                f"'{other.symbol}' {other.dims}."
            )
        return self.scale / other.scale

    def __repr__(self) -> str:  # pragma: no cover
        return f"Unit({self.symbol or self.scale})"


def _join_symbols(a: str, b: str, op: str) -> str:
    if not a and not b:
        return ""
    if not a:
        return f"1{op}{b}" if op == "/" else b
    if not b:
        return a
    return f"{a}{op}{b}"


# --- registry ----------------------------------------------------------------

DIMENSIONLESS = Unit(1.0, _DIMENSIONLESS, "")

_REGISTRY: dict[str, Unit] = {
    # length
    "cm": Unit(1.0, _dims(L=1), "cm"),
    "m": Unit(100.0, _dims(L=1), "m"),
    "km": Unit(1.0e5, _dims(L=1), "km"),
    "pc": Unit(C.PARSEC_CGS, _dims(L=1), "pc"),
    "kpc": Unit(C.KILOPARSEC_CGS, _dims(L=1), "kpc"),
    "Mpc": Unit(C.MEGAPARSEC_CGS, _dims(L=1), "Mpc"),
    # mass
    "g": Unit(1.0, _dims(M=1), "g"),
    "kg": Unit(1.0e3, _dims(M=1), "kg"),
    "Msun": Unit(C.SOLAR_MASS_CGS, _dims(M=1), "Msun"),
    # time
    "s": Unit(1.0, _dims(T=1), "s"),
    "yr": Unit(C.YEAR_CGS, _dims(T=1), "yr"),
    "Myr": Unit(C.YEAR_CGS * 1e6, _dims(T=1), "Myr"),
    "Gyr": Unit(C.GIGAYEAR_CGS, _dims(T=1), "Gyr"),
    # temperature
    "K": Unit(1.0, _dims(K=1), "K"),
    # composite conveniences (also reachable via the parser)
    "erg": Unit(1.0, _dims(L=2, M=1, T=-2), "erg"),
    "dimensionless": DIMENSIONLESS,
    "1": DIMENSIONLESS,
    "": DIMENSIONLESS,
}


def parse_unit(expression: Union[str, Unit]) -> Unit:
    """Parse a unit expression like ``"Msun/Mpc**3"`` or ``"km/s/Mpc"``.

    Grammar (matching how the reference writes unyt strings): ``/`` splits the
    expression into a numerator and successive denominators (``a/b/c`` means
    ``a/(b*c)``); each part is a ``*``-separated product of atoms; each atom is
    ``symbol`` or ``symbol**exponent``.
    """
    if isinstance(expression, Unit):
        return expression
    expression = expression.strip()
    parts = expression.split("/")
    result = _parse_product(parts[0])
    for denominator in parts[1:]:
        result = result / _parse_product(denominator)
    return Unit(result.scale, result.dims, expression)


def _parse_atom(atom: str) -> Unit:
    if atom in _REGISTRY:
        return _REGISTRY[atom]
    raise UnknownUnitError(f"Unknown unit symbol: {atom!r}")


def _parse_product(text: str) -> Unit:
    """Parse a '*'-separated product, keeping '**exponent' attached to its
    symbol (a plain split on '*' would mangle it)."""
    result = DIMENSIONLESS
    tokens: list[str] = []
    buf = ""
    i = 0
    while i < len(text):
        if text[i] == "*":
            if i + 1 < len(text) and text[i + 1] == "*":
                buf += "**"
                i += 2
                continue
            tokens.append(buf)
            buf = ""
            i += 1
        else:
            buf += text[i]
            i += 1
    tokens.append(buf)
    for token in tokens:
        token = token.strip()
        if not token:
            continue
        if "**" in token:
            symbol, _, exponent = token.partition("**")
            result = result * (_parse_atom(symbol.strip()) ** Fraction(exponent.strip()))
        else:
            result = result * _parse_atom(token)
    return result


# --- UnitArray ---------------------------------------------------------------


class UnitArray:
    """An array (NumPy or JAX) tagged with a :class:`Unit`.

    Mirrors the slice of the ``unyt`` API the reference uses: ``.to()``,
    ``.to_value()``, ``.value``, ``.units``, ``.in_cgs()``, arithmetic with
    dimension checking. Conversion is a single scalar multiply, so it is safe
    inside ``jit``-traced code when ``value`` is a JAX array.
    """

    __slots__ = ("value", "units")
    __array_priority__ = 20.0  # win binary ops against bare ndarrays

    def __init__(self, value: Any, units: Union[str, Unit] = ""):
        if isinstance(value, UnitArray):
            units_parsed = parse_unit(units)
            value = value.to_value(units_parsed)
            self.value = value
            self.units = units_parsed
            return
        if isinstance(value, (list, tuple)):
            # unyt_array accepts plain sequences; conversion is a scalar
            # multiply, so coerce once here
            value = np.asarray(value)
        self.value = value
        self.units = parse_unit(units)

    # -- conversions ----------------------------------------------------------
    def to(self, units: Union[str, Unit]) -> "UnitArray":
        target = parse_unit(units)
        factor = self.units.conversion_factor_to(target)
        if factor == 1.0:
            return UnitArray(self.value, target)
        return UnitArray(self.value * factor, target)

    def to_value(self, units: Union[str, Unit, None] = None):
        if units is None:
            return self.value
        return self.to(units).value

    def in_cgs(self) -> "UnitArray":
        cgs = Unit(1.0, self.units.dims, "cgs")
        return UnitArray(self.value * self.units.scale, cgs)

    @property
    def ndview(self):
        return self.value

    # -- array protocol ---------------------------------------------------------
    @property
    def shape(self):
        return np.shape(self.value)

    @property
    def ndim(self):
        return np.ndim(self.value)

    @property
    def dtype(self):
        return np.asarray(self.value).dtype if isinstance(self.value, (int, float)) else self.value.dtype

    def __len__(self):
        return self.shape[0]

    def __array__(self, dtype=None):
        return np.asarray(self.value, dtype=dtype)

    def __getitem__(self, key):
        return UnitArray(self.value[key], self.units)

    def __iter__(self):
        for item in self.value:
            yield UnitArray(item, self.units)

    # -- arithmetic ---------------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, UnitArray):
            return other
        return UnitArray(other, DIMENSIONLESS)

    def __mul__(self, other):
        other = self._coerce(other)
        return UnitArray(self.value * other.value, self.units * other.units)

    __rmul__ = __mul__

    def __truediv__(self, other):
        other = self._coerce(other)
        return UnitArray(self.value / other.value, self.units / other.units)

    def __rtruediv__(self, other):
        other = self._coerce(other)
        return UnitArray(other.value / self.value, other.units / self.units)

    def __add__(self, other):
        other = self._coerce(other)
        return UnitArray(self.value + other.to_value(self.units), self.units)

    __radd__ = __add__

    def __sub__(self, other):
        other = self._coerce(other)
        return UnitArray(self.value - other.to_value(self.units), self.units)

    def __rsub__(self, other):
        other = self._coerce(other)
        return UnitArray(other.to_value(self.units) - self.value, self.units)

    def __neg__(self):
        return UnitArray(-self.value, self.units)

    def __pow__(self, exponent):
        return UnitArray(self.value**exponent, self.units**exponent)

    def __eq__(self, other):
        other = self._coerce(other)
        return self.value == other.to_value(self.units)

    def __lt__(self, other):
        other = self._coerce(other)
        return self.value < other.to_value(self.units)

    def __le__(self, other):
        other = self._coerce(other)
        return self.value <= other.to_value(self.units)

    def __gt__(self, other):
        other = self._coerce(other)
        return self.value > other.to_value(self.units)

    def __ge__(self, other):
        other = self._coerce(other)
        return self.value >= other.to_value(self.units)

    def __repr__(self) -> str:  # pragma: no cover
        return f"UnitArray({self.value!r}, '{self.units.symbol}')"

    def sqrt(self) -> "UnitArray":
        if isinstance(self.value, np.ndarray) or np.isscalar(self.value):
            return UnitArray(np.sqrt(self.value), self.units ** Fraction(1, 2))
        import jax.numpy as jnp

        return UnitArray(jnp.sqrt(self.value), self.units ** Fraction(1, 2))

    def sum(self, axis=None) -> "UnitArray":
        return UnitArray(self.value.sum(axis=axis), self.units)

    def copy(self) -> "UnitArray":
        value = self.value.copy() if hasattr(self.value, "copy") else self.value
        return UnitArray(value, self.units)


def unit_array(value, units: Union[str, Unit] = "") -> UnitArray:
    """Factory matching ``unyt_array(value, units)`` call style."""
    return UnitArray(value, units)


def unit_quantity(value: float, units: Union[str, Unit] = "") -> UnitArray:
    """Factory matching ``unyt_quantity(value, units)`` call style."""
    return UnitArray(float(value), units)


# unyt-flavoured aliases so downstream code reads like the reference's API.
unyt_array = unit_array
unyt_quantity = unit_quantity
