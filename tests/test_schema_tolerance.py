"""Schema-tolerance fuzz for the EAGLE reader (VERDICT r3 item 9).

No real EAGLE output is available in this environment, so these tests
approximate real-data validation by mutating synthetic files into the
schema variants real archives contain (reference schema spec:
`_SnapshotEAGLE.py:78-113`) and asserting the reader either adapts or
fails gracefully through the `io.errors` taxonomy — never a bare
KeyError or a silent empty array.
"""

import h5py
import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.errors import (
    SnapshotFormatError,
    SnipshotFieldError,
    SnipshotOperationError,
)
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_snapshot,
)


def _snapshot(tmp_path, **kw):
    spec = SyntheticSnapshotSpec(
        n_gas=256, n_dm=128, n_star=32, n_bh=2, n_files=2, **kw
    )
    return write_snapshot(str(tmp_path), spec)


def _all_files(first_path):
    import glob

    stem = first_path.rsplit(".", 2)[0]
    return sorted(glob.glob(f"{stem}.*.hdf5"))


class TestHeaderVariants:
    def test_missing_units_group_is_format_error(self, tmp_path):
        path, _ = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            del f["Units"]
        with pytest.raises(SnapshotFormatError, match="Units"):
            SnapshotEAGLE(path)

    def test_missing_omega_baryon_is_format_error(self, tmp_path):
        path, _ = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            del f["Header"].attrs["OmegaBaryon"]
        with pytest.raises(SnapshotFormatError, match="OmegaBaryon"):
            SnapshotEAGLE(path)

    def test_f32_mass_table_and_attrs(self, tmp_path):
        """Archives store some headers in f32; values must still read."""
        path, truth = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            mt = np.asarray(f["Header"].attrs["MassTable"], np.float32)
            f["Header"].attrs["MassTable"] = mt
            f["Header"].attrs["BoxSize"] = np.float32(
                f["Header"].attrs["BoxSize"]
            )
        snap = SnapshotEAGLE(path)
        assert np.isclose(
            float(snap.dark_matter_particle_mass.to_value("Msun")),
            truth.dm_particle_mass,
            rtol=1e-5,
        )

    def test_f32_coordinate_datasets(self, tmp_path):
        """On-disk f32 datasets (the real storage dtype) read losslessly
        into the f64 unit pipeline."""
        path, truth = _snapshot(tmp_path)
        for fp in _all_files(path):
            with h5py.File(fp, "r+") as f:
                for ptg in ("PartType0", "PartType1"):
                    raw = np.asarray(f[f"{ptg}/Coordinates"], np.float32)
                    attrs = dict(f[f"{ptg}/Coordinates"].attrs)
                    del f[f"{ptg}/Coordinates"]
                    ds = f[ptg].create_dataset("Coordinates", data=raw)
                    for k, v in attrs.items():
                        ds.attrs[k] = v
        snap = SnapshotEAGLE(path)
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        np.testing.assert_allclose(
            pos, truth.positions[ParticleType.gas], rtol=2e-7, atol=1e-6
        )

    def test_missing_dataset_is_format_error_not_silent(self, tmp_path):
        """A dataset absent from every file of a populated particle group
        must raise, not return an empty array."""
        path, _ = _snapshot(tmp_path)
        for fp in _all_files(path):
            with h5py.File(fp, "r+") as f:
                del f["PartType0/Temperature"]
        snap = SnapshotEAGLE(path)
        with pytest.raises(SnapshotFormatError, match="Temperature"):
            snap.get_temperatures(ParticleType.gas)


class TestSnipshotSubset:
    def test_snipshot_reduced_fields(self, tmp_path):
        path, truth = _snapshot(tmp_path, snipshot=True)
        assert "snipshot_" in path and "/snip_" in path
        snap = SnapshotEAGLE(path)
        assert snap.is_snipshot
        # present fields read normally
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        assert pos.shape == truth.positions[ParticleType.gas].shape
        # snipshot-absent fields fail through the snipshot taxonomy
        with pytest.raises(SnipshotFieldError):
            snap.get_temperatures(ParticleType.gas)
        with pytest.raises((SnipshotFieldError, SnipshotOperationError)):
            snap.get_elemental_abundance(ParticleType.gas, "O")

    def test_snipshot_number_densities_need_default_abundance(self, tmp_path):
        path, _ = _snapshot(tmp_path, snipshot=True)
        snap = SnapshotEAGLE(path)
        with pytest.raises(SnipshotOperationError):
            snap.get_number_densities(ParticleType.gas, "H")
        n_h = snap.get_number_densities(
            ParticleType.gas, "H", default_abundance=0.75
        )
        assert np.isfinite(n_h.value).all() and (n_h.value > 0).all()


class TestSWIFTHeaderVariants:
    """SWIFT schema drift (VERDICT r4: extend fuzz beyond EAGLE). Real
    SWIFT outputs vary in Scale-factor presence, BoxSize rank, attribute
    array-ness, and Cells metadata completeness."""

    def _swift(self, tmp_path, **kw):
        from astro_sph_tools_tpu.io.synthetic import write_swift_snapshot

        spec = SyntheticSnapshotSpec(n_gas=256, n_dm=64, n_star=16, n_bh=2, **kw)
        return write_swift_snapshot(str(tmp_path), spec)

    def test_missing_scale_factor_derives_from_redshift(self, tmp_path):
        from astro_sph_tools_tpu.io.swift import SnapshotSWIFT

        path, _ = self._swift(tmp_path)
        with h5py.File(path, "r+") as f:
            del f["Header"].attrs["Scale-factor"]
        snap = SnapshotSWIFT(path)
        assert snap.a == pytest.approx(1.0 / (1.0 + snap.redshift))

    def test_scalar_boxsize_broadcasts(self, tmp_path):
        from astro_sph_tools_tpu.io.swift import SnapshotSWIFT

        path, truth = self._swift(tmp_path)
        with h5py.File(path, "r+") as f:
            box = float(np.atleast_1d(f["Header"].attrs["BoxSize"])[0])
            f["Header"].attrs["BoxSize"] = box  # scalar variant
        snap = SnapshotSWIFT(path)
        assert snap.box_size.value.shape == (3,)
        np.testing.assert_allclose(snap.box_size.value, 10.0)

    def test_scalar_attr_variants(self, tmp_path):
        """h / Redshift stored as scalars instead of 1-element arrays."""
        from astro_sph_tools_tpu.io.swift import SnapshotSWIFT

        path, truth = self._swift(tmp_path)
        with h5py.File(path, "r+") as f:
            f["Cosmology"].attrs["h"] = float(
                np.atleast_1d(f["Cosmology"].attrs["h"])[0]
            )
            f["Header"].attrs["Redshift"] = float(
                np.atleast_1d(f["Header"].attrs["Redshift"])[0]
            )
        snap = SnapshotSWIFT(path)
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        np.testing.assert_allclose(
            pos, truth.positions[ParticleType.gas], rtol=1e-10
        )

    def test_no_coordinates_anywhere_is_format_error(self, tmp_path):
        from astro_sph_tools_tpu.io.swift import SnapshotSWIFT

        path, _ = self._swift(tmp_path)
        with h5py.File(path, "r+") as f:
            for pt in list(f):
                if pt.startswith("PartType") and "Coordinates" in f[pt]:
                    del f[pt]["Coordinates"]
        with pytest.raises(SnapshotFormatError, match="coordinates"):
            SnapshotSWIFT(path)

    def test_cells_without_counts_for_type_still_exact(self, tmp_path):
        """Cells present but missing a type's Counts -> mask-only path."""
        from astro_sph_tools_tpu.io.swift import SnapshotSWIFT

        path, truth = self._swift(tmp_path, swift_cells_dim=4)
        with h5py.File(path, "r+") as f:
            del f["Cells/Counts/PartType0"]
        snap = SnapshotSWIFT(path)
        box = float(snap.box_size.value[0])
        snap.restrict_data_comoving_loading_region(
            2.0, 8.0, 0.0, box, 0.0, box
        )
        got = snap.get_positions(ParticleType.gas).to_value("Mpc")
        p = truth.positions[ParticleType.gas]
        assert len(got) == ((p[:, 0] >= 2.0) & (p[:, 0] < 8.0)).sum()


def _all_tng_files(first_path):
    import glob
    import os as _os

    d = _os.path.dirname(first_path)
    return sorted(glob.glob(_os.path.join(d, "snap_*.hdf5")))


class TestTNGHeaderVariants:
    """TNG schema drift: optional ElectronAbundance/GFM fields, scalar
    attrs, missing mass table entries."""

    def _tng(self, tmp_path, **kw):
        from astro_sph_tools_tpu.io.synthetic import write_tng_snapshot

        spec = SyntheticSnapshotSpec(n_gas=256, n_dm=64, n_star=16, n_bh=2, **kw)
        first, _cat, parts, extra = write_tng_snapshot(str(tmp_path), spec)
        return first, (parts, extra)

    def test_missing_electron_abundance_uses_primordial_mu(self, tmp_path):
        """Without ElectronAbundance the derived temperature must still
        work (neutral-primordial mean molecular weight fallback) or fail
        through the error taxonomy — never a KeyError."""
        from astro_sph_tools_tpu.io.tng import SnapshotTNG

        path, truth = self._tng(tmp_path)
        for p in _all_tng_files(path):
            with h5py.File(p, "r+") as f:
                if "PartType0/ElectronAbundance" in f:
                    del f["PartType0/ElectronAbundance"]
        snap = SnapshotTNG(path)
        try:
            t = snap.get_temperatures(ParticleType.gas).to_value("K")
            assert np.isfinite(t).all() and (t > 0).all()
        except SnapshotFormatError:
            pass  # graceful taxonomy failure is acceptable

    def test_missing_gfm_metallicity_is_format_error(self, tmp_path):
        from astro_sph_tools_tpu.io.tng import SnapshotTNG

        path, _ = self._tng(tmp_path)
        for p in _all_tng_files(path):
            with h5py.File(p, "r+") as f:
                if "PartType0/GFM_Metallicity" in f:
                    del f["PartType0/GFM_Metallicity"]
        snap = SnapshotTNG(path)
        with pytest.raises(SnapshotFormatError):
            snap.get_metallicities(ParticleType.gas)

    def test_scalar_header_attrs(self, tmp_path):
        from astro_sph_tools_tpu.io.tng import SnapshotTNG

        path, truth = self._tng(tmp_path)
        with h5py.File(path, "r+") as f:
            hdr = f["Header"].attrs
            hdr["Redshift"] = float(np.atleast_1d(hdr["Redshift"])[0])
            hdr["HubbleParam"] = float(np.atleast_1d(hdr["HubbleParam"])[0])
        snap = SnapshotTNG(path)
        parts, extra = truth
        order = extra["order"][ParticleType.gas]
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        np.testing.assert_allclose(
            pos, parts.positions[ParticleType.gas][order], rtol=1e-6
        )
