"""IO error vocabulary (parity: `/root/reference/src/astro_sph_tools/io/errors/__init__.py:5-38`)."""

from __future__ import annotations

from typing import Optional


class SnipshotError(NotImplementedError):
    """Base for errors caused by the dataset being a snipshot."""


class SnipshotOperationError(SnipshotError):
    """Operation invalid on snipshot data."""

    def __init__(self, operation_name: str, message: Optional[str] = None) -> None:
        detail = f"\n    {message}" if message else ""
        super().__init__(f'Operation "{operation_name}" not supported for snipshots.{detail}')


class SnipshotFieldError(SnipshotError):
    """Particle field unavailable in snipshots."""

    def __init__(self, field_name: str, message: Optional[str] = None) -> None:
        detail = f"\n    {message}" if message else ""
        # mirror the reference's MRO quirk-free message
        NotImplementedError.__init__(
            self, f'Particle field "{field_name}" not available in snipshots.{detail}'
        )


class HaloDefinitionNotSupportedError(NotImplementedError):
    """Halo definition not supported by a catalogue implementation."""

    def __init__(
        self,
        definition_type: type,
        catalogue_type: type,
        definition_detail: Optional[str] = None,
        message: Optional[str] = None,
    ) -> None:
        extra = f" {definition_detail}" if definition_detail else ""
        detail = f"\n    {message}" if message else ""
        super().__init__(
            f'Halo definition of type "{definition_type.__name__}"{extra} not supported '
            f'by catalogue type "{catalogue_type.__name__}".{detail}'
        )


class SnapshotFormatError(ValueError):
    """Snapshot file does not conform to the expected on-disk schema."""
