"""SPH smoothing kernels (pure jax.numpy; fuse into Pallas deposit passes)."""

from .splines import (
    KERNELS,
    KernelSpec,
    cubic_spline_kernel,
    get_kernel,
    integrated_kernel_lookup,
    integrated_kernel_table,
    quartic_spline_kernel,
    quintic_spline_kernel,
    wendland_c2_kernel,
    wendland_c4_kernel,
    wendland_c6_kernel,
)

__all__ = [
    "KERNELS",
    "KernelSpec",
    "cubic_spline_kernel",
    "get_kernel",
    "integrated_kernel_lookup",
    "integrated_kernel_table",
    "quartic_spline_kernel",
    "quintic_spline_kernel",
    "wendland_c2_kernel",
    "wendland_c4_kernel",
    "wendland_c6_kernel",
]
