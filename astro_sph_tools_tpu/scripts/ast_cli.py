"""ast-tpu: framework info entry point (parity: `_scripts/ast.py:9-10`)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from ..__about__ import __version__

    print(f"astro-sph-tools-tpu v{__version__}")
    print("TPU-native SPH snapshot analysis and rendering framework.")
    print("Tools: ast-tpu-render, ast-tpu-find-nearest-haloes")
    try:
        import jax

        print(f"JAX backend: {jax.default_backend()} ({len(jax.devices())} device(s))")
    except Exception as err:  # pragma: no cover
        print(f"JAX unavailable: {err}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
